"""Weight codec (LFPZ) tests."""

import numpy as np
import pytest

from lbdrn_msic_tpu.codecs import weights as wc


def _weight_like(n=10884, seed=0):
    """Vector statistically like a trained SIREN state dict."""
    rng = np.random.default_rng(seed)
    scales = rng.choice([0.01, 0.005, 0.04], size=n)
    return (rng.standard_normal(n) * scales).astype(np.float32)


@pytest.mark.parametrize("precision", [8, 12, 16, 24, 32])
def test_roundtrip_is_truncation(precision):
    v = _weight_like(4096)
    stream = wc.compress(v, precision)
    back = wc.decompress(stream)
    want = wc.quantize(v, precision)
    np.testing.assert_array_equal(back, want)


def test_precision32_lossless():
    v = _weight_like(1000)
    v[0] = 0.0
    v[1] = -0.0
    v[2] = np.float32(1e-40)  # denormal
    v[3] = np.float32(3.4e38)
    back = wc.decompress(wc.compress(v, 32))
    np.testing.assert_array_equal(back.view(np.uint32), v.view(np.uint32))


def test_truncation_error_bound():
    v = _weight_like(5000)
    q = wc.quantize(v, 16)
    # 16 retained bits = sign + 8 exp + 7 mantissa -> rel err < 2^-7
    nz = v != 0
    rel = np.abs((q[nz] - v[nz]) / v[nz])
    assert rel.max() < 2**-6


def test_compression_beats_raw():
    """Entropy-coded stream must undercut 2 bytes/value at precision 16
    (the fpzip reference lands at ~2.02 B/value, SURVEY §6)."""
    v = _weight_like(10884)
    stream = wc.compress(v, 16)
    bytes_per_value = (len(stream) - 10) / v.size
    assert bytes_per_value < 2.0, bytes_per_value


def test_raw_codec_roundtrip():
    v = _weight_like(2048)
    back = wc.decompress_raw(wc.compress_raw(v, 16))
    np.testing.assert_array_equal(back, wc.quantize(v, 16))


def test_dispatch():
    v = _weight_like(128)
    for codec in ("fpz", "raw16"):
        s = wc.compress_weights(v, 16, codec)
        back = wc.decompress_weights(s, codec)
        np.testing.assert_array_equal(back, wc.quantize(v, 16))
    with pytest.raises(ValueError):
        wc.compress_weights(v, 16, "nope")


def test_empty_and_single():
    for v in (np.zeros(0, np.float32), np.asarray([0.123], np.float32)):
        back = wc.decompress(wc.compress(v, 16))
        np.testing.assert_array_equal(back, wc.quantize(v, 16))


def test_reference_fpzip_payload_rejected():
    """A reference-produced v0 body carries fpzip weight bytes; the decoder
    must identify them and raise the recorded-deviation error, not
    misparse (docs/FORMAT.md 'v0 body deviation record')."""
    import pytest

    from lbdrn_msic_tpu.codecs.weights import decompress

    for magic in (b"fpz\x10", b"fpy\x01"):
        with pytest.raises(ValueError, match="fpzip weight payload"):
            decompress(magic + b"\x00" * 32)


def test_reference_jp2_payload_rejected():
    import pytest

    from lbdrn_msic_tpu.codecs.base_layer import decode_base

    jp2_sig = b"\x00\x00\x00\x0cjP  \x0d\x0a\x87\x0a" + b"\x00" * 16
    with pytest.raises(ValueError, match="JPEG 2000 base payload"):
        decode_base(jp2_sig, "jp2")
    j2k_soc = b"\xff\x4f\xff\x51" + b"\x00" * 16
    with pytest.raises(ValueError, match="JPEG 2000 base payload"):
        decode_base(j2k_soc, "jp2")
