"""Golden-bitstream regression: the wire format must stay stable.

tests/data/golden_k5.bin was produced by encode_image on the CPU backend
(K=5, D=2, bc=64, nl=2, e=2, bs=2048, seed 19920517) from the committed
source scene.  Decoding it must keep producing the identical reconstruction;
any change to the header layout, LFPZ coder, JP2 container, or decode math
breaks this test and therefore flags a format break.
"""

import hashlib
import os

import numpy as np

from lbdrn_msic_tpu.codec import decode_stream
from lbdrn_msic_tpu.io.header import decode_header

DATA = os.path.join(os.path.dirname(__file__), "data")
GOLDEN_SHA = "c6333939318b57c0b6c11c7817358c902c34185d5c01c878ea44c66bbe77b81e"


def test_golden_stream_decodes_bit_exactly():
    with open(os.path.join(DATA, "golden_k5.bin"), "rb") as f:
        stream = f.read()
    h = decode_header(stream)
    assert (h.K, h.D, h.base_channel, h.num_layers) == (5, 2, 64, 2)
    rec, _ = decode_stream(stream)
    assert rec.shape == (4, 64, 64) and rec.dtype == np.uint16
    assert hashlib.sha256(rec.tobytes()).hexdigest() == GOLDEN_SHA

    src = np.load(os.path.join(DATA, "golden_k5_src.npy"))
    np.testing.assert_array_equal(rec >> 5, src >> 5)  # MSB path lossless


# ---------------------------------------------------------------------------
# Per-wire-format goldens (VERDICT r4 weak #6): one committed fixture per
# format docs/FORMAT.md specifies, regenerated ONLY on deliberate format
# bumps via scripts/make_goldens.py.  Re-encode round-trips cannot catch an
# encoder+decoder drifting together; decoding committed bytes can.  The
# framework-owned deterministic coders (LLPC, LFPZ) additionally assert
# byte-exact RE-encoding, locking the encoder side too.
# ---------------------------------------------------------------------------


def _read(name: str) -> bytes:
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


def _sha(b) -> str:
    return hashlib.sha256(bytes(b)).hexdigest()


def _native_or_skip():
    import pytest

    from lbdrn_msic_tpu.codecs import _native

    if not _native.available():
        pytest.skip("native codec library unavailable")


def test_golden_llpc_v1():
    _native_or_skip()
    from lbdrn_msic_tpu.codecs import lpc

    msb = np.load(os.path.join(DATA, "golden_formats_msb.npy"))
    stream = _read("golden_llpc_v1.bin")
    np.testing.assert_array_equal(lpc.decode(stream), msb)
    assert lpc.chunk_info(stream) is None  # v1 is not chunked
    assert lpc.encode(msb) == stream  # encoder locked too


def test_golden_llpc_v2():
    _native_or_skip()
    from lbdrn_msic_tpu.codecs import lpc

    msb = np.load(os.path.join(DATA, "golden_formats_msb.npy"))
    stream = _read("golden_llpc_v2.bin")
    np.testing.assert_array_equal(lpc.decode(stream), msb)
    C, H, W, itemsize, cr, nk, mx = lpc.chunk_info(stream)
    assert (C, H, W, itemsize, cr, nk) == (3, 70, 48, 1, 32, 3)
    assert mx == int(msb.max())
    # the remainder chunk (70 = 2*32 + 6) decodes in isolation
    np.testing.assert_array_equal(
        lpc.decode_chunk(stream, 1, 2, 6, 48), msb[1, 64:70]
    )
    assert lpc.encode(msb, chunk_rows=32) == stream


def test_golden_lj2c():
    from lbdrn_msic_tpu.codecs.base_layer import decode_base

    msb = np.load(os.path.join(DATA, "golden_formats_msb.npy"))
    out = decode_base(_read("golden_lj2c.bin"), "jp2")
    assert out.dtype == np.uint16  # encoded from the widened plane
    np.testing.assert_array_equal(out, msb.astype(np.uint16))


def test_golden_lj2l():
    from lbdrn_msic_tpu.eval.anchors import _jp2_lossy_decode

    out = _jp2_lossy_decode(_read("golden_lj2l.bin"))
    assert out.shape == (3, 70, 48)
    assert _sha(out.tobytes()) == (
        "e944f90dc536e2e037beccecf7b0eae83782245b666f8819e1f56b0a92388a21"
    )


def test_golden_lfpz():
    from lbdrn_msic_tpu.codecs.weights import (
        compress_weights,
        decompress_weights,
    )

    stream = _read("golden_lfpz.bin")
    vec = decompress_weights(stream)
    assert vec.dtype == np.float32 and vec.shape == (520,)
    assert _sha(vec.tobytes()) == (
        "1044c0466f476e8b2ff3f5ea88b3c0a0a73051af587fa53b785c80592f81a0c0"
    )
    src = np.load(os.path.join(DATA, "golden_lfpz_src.npy"))
    assert compress_weights(src, precision=16) == stream


def test_golden_v0_header_stream():
    stream = _read("golden_v0_k5.bin")
    h = decode_header(stream)
    assert (h.version, h.K, h.split_ratio) == (0, 5, 1)
    rec, _ = decode_stream(stream)
    assert _sha(rec.tobytes()) == (
        "cb579dffceaaffc9100d4d184db365a58a45618aecb6ca553da4fdb87624e525"
    )
    src = np.load(os.path.join(DATA, "golden_container_src.npy"))
    np.testing.assert_array_equal(rec >> 5, src >> 5)


def test_golden_sr2_tiled_stream():
    stream = _read("golden_sr2_k5.bin")
    h = decode_header(stream)
    assert h.split_ratio == 2 and h.n_tiles == 4
    rec, _ = decode_stream(stream)
    assert rec.shape == (2, 91, 77)  # remainder tiles reassembled
    assert _sha(rec.tobytes()) == (
        "93e899c88642349232a02bdff510e33881969d85e7eed17f4fb66cd7c37b8fa7"
    )
    src = np.load(os.path.join(DATA, "golden_container_src.npy"))
    np.testing.assert_array_equal(rec >> 5, src >> 5)
