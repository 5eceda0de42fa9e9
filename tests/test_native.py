"""Native codec library tests: build, byte-parity with Python, LPC codec."""

import numpy as np
import pytest

from lbdrn_msic_tpu.codecs import _native
from lbdrn_msic_tpu.codecs import weights as wc
from lbdrn_msic_tpu.utils.synth import synth_scene

pytestmark = pytest.mark.skipif(
    not _native.available(), reason="native codec library failed to build"
)


def _weight_like(n=10884, seed=0):
    rng = np.random.default_rng(seed)
    scales = rng.choice([0.01, 0.005, 0.04], size=n)
    return (rng.standard_normal(n) * scales).astype(np.float32)


@pytest.mark.parametrize("precision", [8, 16, 24, 32])
def test_lfpz_native_python_byte_identical(precision):
    """The native and Python LFPZ implementations must emit identical bytes
    and decode each other's streams."""
    v = _weight_like(3000)
    native_stream = wc.compress(v, precision)  # native path (available)
    py_stream = wc._compress_py(v, precision)
    assert native_stream == py_stream
    np.testing.assert_array_equal(
        wc.decompress(native_stream), wc._decompress_py(native_stream)
    )


def test_lfpz_native_roundtrip_large():
    v = _weight_like(92676, seed=3)  # (256,2) model size
    stream = wc.compress(v, 16)
    back = wc.decompress(stream)
    np.testing.assert_array_equal(back, wc.quantize(v, 16))
    assert len(stream) / v.size < 2.0


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_lpc_roundtrip(dtype):
    from lbdrn_msic_tpu.codecs import lpc

    img = synth_scene(200, 160, channels=4, effective_bits=12, seed=5)
    msb = (img >> 5).astype(dtype)
    stream = lpc.encode(msb)
    back = lpc.decode(stream)
    assert back.dtype == dtype
    np.testing.assert_array_equal(back, msb)


def test_lpc_through_base_layer_dispatch():
    from lbdrn_msic_tpu.codecs.base_layer import decode_base, encode_base

    img = synth_scene(96, 96, channels=8, effective_bits=10, seed=6)
    msb = (img >> 3).astype(np.uint16)
    stream = encode_base(msb, "lpc")
    back = decode_base(stream, "lpc")
    np.testing.assert_array_equal(back, msb)


def test_lpc_compression_competitive_with_jp2():
    """On smooth satellite-like content LPC should be within ~10% of (and
    usually beat) OpenJPEG lossless."""
    from lbdrn_msic_tpu.codecs.base_layer import encode_base

    img = synth_scene(512, 512, channels=4, effective_bits=12, seed=7)
    msb = (img >> 4).astype(np.uint16)
    lpc_len = len(encode_base(msb, "lpc"))
    jp2_len = len(encode_base(msb, "jp2"))
    assert lpc_len < jp2_len * 1.10, (lpc_len, jp2_len)


def test_lpc_extremes():
    from lbdrn_msic_tpu.codecs import lpc

    flat = np.zeros((1, 8, 8), np.uint16)
    np.testing.assert_array_equal(lpc.decode(lpc.encode(flat)), flat)
    rng = np.random.default_rng(0)
    noise = rng.integers(0, 65535, (2, 33, 17)).astype(np.uint16)
    np.testing.assert_array_equal(lpc.decode(lpc.encode(noise)), noise)
    one = np.asarray([[[1234]]], np.uint16)
    np.testing.assert_array_equal(lpc.decode(lpc.encode(one)), one)


def test_lpc_v2_chunked_roundtrip():
    """Row-chunked LLPC v2: whole-stream decode, per-chunk decode, and
    metadata all agree with the source; v1 streams report no chunk info."""
    from lbdrn_msic_tpu.codecs import lpc

    img = synth_scene(700, 96, channels=3, effective_bits=12, seed=31)
    msb = (img >> 5).astype(np.uint8)
    v2 = lpc.encode(msb, chunk_rows=256)
    np.testing.assert_array_equal(lpc.decode(v2), msb)
    C, H, W, itemsize, cr, nk, mx = lpc.chunk_info(v2)
    assert (C, H, W, itemsize, cr, nk) == (3, 700, 96, 1, 256, 3)
    assert mx == int(msb.max())
    for ci in range(C):
        for k in range(nk):
            rows = min(cr, H - k * cr)
            np.testing.assert_array_equal(
                lpc.decode_chunk(v2, ci, k, rows, W),
                msb[ci, k * cr : k * cr + rows].astype(np.uint16),
            )
    assert lpc.chunk_info(lpc.encode(msb)) is None  # v1
    # uint16 storage
    wide = (img >> 1)
    v2w = lpc.encode(wide, chunk_rows=256)
    np.testing.assert_array_equal(lpc.decode(v2w), wide)
    # chunk restart cost is bounded even at this tiny 256x96-px chunk area
    # (production chunks are 512 x thousands: measured +0.27% at 1500x1200,
    # shrinking with area — the base_layer threshold keeps short planes v1)
    assert len(v2) < len(lpc.encode(msb)) * 1.07


def test_lpc_v2_base_layer_threshold():
    """encode_base('lpc') emits v2 only for tall planes (>= LPC_CHUNK_MIN_H)."""
    from lbdrn_msic_tpu.codecs import lpc
    from lbdrn_msic_tpu.codecs.base_layer import (
        LPC_CHUNK_MIN_H,
        decode_base,
        encode_base,
    )

    tall = synth_scene(LPC_CHUNK_MIN_H, 64, channels=2, seed=32) >> 5
    short = tall[:, :512]
    s_tall = encode_base(tall.astype(np.uint16), "lpc")
    s_short = encode_base(short.astype(np.uint16), "lpc")
    assert lpc.chunk_info(s_tall) is not None
    assert lpc.chunk_info(s_short) is None
    np.testing.assert_array_equal(decode_base(s_tall, "lpc"), tall)
    np.testing.assert_array_equal(decode_base(s_short, "lpc"), short)


def test_lpc_rejects_degenerate_headers():
    """A stream claiming c=0 or a bad itemsize must FAIL the parse, not
    'succeed' with an uninitialized output buffer (ADVICE r4): both wire
    versions, peek/decode/chunk_info all reject."""
    import struct

    from lbdrn_msic_tpu.codecs import lpc

    def v2_header(c=0, itemsize=2, h=4, w=4, cr=2):
        return (
            b"LLPC" + bytes([2, itemsize, c])
            + struct.pack("<III", h, w, cr) + struct.pack("<H", 100)
        )

    def v1_header(c=0, itemsize=2, h=4, w=4):
        return b"LLPC" + bytes([1, itemsize, c]) + struct.pack("<II", h, w)

    for bad in (
        v2_header(c=0),
        v2_header(c=1, itemsize=3),
        v2_header(c=1, itemsize=0),
        v1_header(c=0),
        v1_header(c=1, itemsize=3),
    ):
        with pytest.raises(ValueError):
            lpc.decode(bad)
        with pytest.raises(ValueError):
            lpc.chunk_info(bad)
    # a well-formed v1 header whose size table is truncated off the end
    # must error, not read out of bounds
    with pytest.raises(RuntimeError):
        lpc.decode(v1_header(c=1, itemsize=2))


def test_native_assemble_residual_matches_numpy():
    """assemble.cc one-pass bitplane assembly == the numpy unpackbits
    oracle, for uint8/uint16 bases, byte-tail sizes and K edge cases."""
    import lbdrn_msic_tpu.codecs._native as _nat
    from lbdrn_msic_tpu.decode.reconstruct import _assemble_band

    rng = np.random.default_rng(5)
    for K, dt, n in [(5, np.uint8, 4096), (10, np.uint16, 8 * 37 + 3),
                     (1, np.uint8, 8), (15, np.uint16, 1001)]:
        base = rng.integers(0, 1 << 6, n, dtype=np.uint16).astype(dt)
        base = base.reshape(1, 1, n)
        got = [
            rng.integers(0, 256, -(-n // 8), dtype=np.uint8)
            for _ in range(K)
        ]
        have = _assemble_band(got, base, K)
        real_load = _nat.load
        try:
            _nat.load = lambda: None  # force the numpy oracle path
            want = _assemble_band(got, base, K)
        finally:
            _nat.load = real_load
        np.testing.assert_array_equal(have, want)


# ---- native TIFF chunk decoders (tiffcodecs.cc) vs the Python oracles ----

def _lzw_encode_tiff(data: bytes) -> bytes:
    """Minimal conformant TIFF-LZW encoder (MSB-first, early change) used
    only to generate test streams for the decoders."""
    out = bytearray()
    bitbuf, bitcnt = 0, 0

    def emit(code, width):
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << width) | code
        bitcnt += width
        while bitcnt >= 8:
            out.append((bitbuf >> (bitcnt - 8)) & 0xFF)
            bitcnt -= 8

    CLEAR, EOI = 256, 257
    table = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    emit(CLEAR, width)
    w = b""
    for ch in data:
        wc_ = w + bytes([ch])
        if wc_ in table:
            w = wc_
            continue
        emit(table[w], width)
        table[wc_] = next_code
        next_code += 1
        # encoder-side early change: widen when the NEXT code would not fit
        if next_code + 1 > (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:  # conventional reset before the table fills
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
        w = bytes([ch])
    if w:
        emit(table[w], width)
    emit(EOI, width)
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        lit = i
        while (
            i < n and i - lit < 128
            and not (i + 1 < n and data[i + 1] == data[i])
        ):
            i += 1
        out.append(i - lit - 1)
        out += data[lit:i]
    return bytes(out)


def _tiff_payloads():
    rng = np.random.default_rng(7)
    flat = synth_scene(64, 96, channels=2, seed=70).tobytes()
    return [
        b"",
        b"A",
        b"ABABABABAB" * 500,
        bytes(rng.integers(0, 4, 5000).astype(np.uint8)),  # repetitive
        bytes(rng.integers(0, 256, 20000).astype(np.uint8)),  # incompressible
        bytes(10_000),  # constant
        flat,  # realistic raster bytes (spans an LZW table reset)
    ]


def test_native_lzw_matches_python():
    from lbdrn_msic_tpu.io.tiff import _lzw_decode, _native_chunk_decode

    for payload in _tiff_payloads():
        stream = _lzw_encode_tiff(payload)
        py = _lzw_decode(stream)
        assert py == payload  # the Python oracle itself round-trips
        nat = _native_chunk_decode("lbdrn_lzw_decode", stream, len(payload))
        if payload:
            assert nat == payload
        # expected-size truncation stops mid-stream consistently
        for cut in (0, 1, len(payload) // 2):
            nat_cut = _native_chunk_decode("lbdrn_lzw_decode", stream, cut)
            if stream:
                assert nat_cut == payload[:cut]


def test_native_packbits_matches_python():
    from lbdrn_msic_tpu.io.tiff import _native_chunk_decode, _packbits_decode

    for payload in _tiff_payloads():
        stream = _packbits_encode(payload)
        py = _packbits_decode(stream)
        assert py == payload
        nat = _native_chunk_decode("lbdrn_packbits_decode", stream, len(payload))
        if payload:
            assert nat == payload
        cut = len(payload) // 3
        nat_cut = _native_chunk_decode("lbdrn_packbits_decode", stream, cut)
        if stream:
            assert nat_cut == payload[:cut]


def test_native_lzw_rejects_garbage():
    """Malformed streams return None (callers fall back to Python, which
    raises) instead of crashing or emitting unbounded output."""
    from lbdrn_msic_tpu.io.tiff import _native_chunk_decode

    # opens with a non-literal, non-clear code -> invalid
    bad = bytes([0xFF, 0xFF, 0xFF, 0xFF])
    assert _native_chunk_decode("lbdrn_lzw_decode", bad, 1024) is None


def test_native_lzw_requires_initial_clear():
    """Data codes before the first ClearCode are rejected (the Python
    oracle raises for this class of stream; results must not be
    platform-dependent on whether the native library built)."""
    from lbdrn_msic_tpu.io.tiff import _native_chunk_decode

    # 9-bit code 'A' (65) first, no leading CLEAR
    bitbuf = (65 << 7)  # 65 in 9 bits, left-aligned in 2 bytes
    bad = bytes([(bitbuf >> 8) & 0xFF, bitbuf & 0xFF])
    assert _native_chunk_decode("lbdrn_lzw_decode", bad, 64) is None
