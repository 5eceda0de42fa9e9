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
