"""Header wire-format tests (reference layout: encode.py:37-64, decode.py:25-53)."""

import pytest

from lbdrn_msic_tpu.core.config import CodecConfig, FeatureSpec, ModelSpec
from lbdrn_msic_tpu.io.header import (
    StreamHeader,
    decode_header,
    encode_header,
    header_from_config,
    header_size,
)


def _mk(version, sr=1, **kw):
    d = dict(
        split_ratio=sr, width=2048, height=2048, K=5, D=2,
        base_channel=64, num_layers=2,
        nn_bytes=[21931] * sr * sr, base_bytes=[1234567] * sr * sr,
        version=version,
    )
    d.update(kw)
    return StreamHeader(**d)


@pytest.mark.parametrize("version", [0, 1])
@pytest.mark.parametrize("sr", [1, 2, 3])
def test_roundtrip(version, sr):
    h = _mk(version, sr=sr)
    wire = encode_header(h)
    assert header_size(wire) == len(wire)
    back = decode_header(wire + b"garbage-tail")
    assert back.split_ratio == sr
    assert (back.width, back.height) == (2048, 2048)
    assert (back.K, back.D, back.base_channel, back.num_layers) == (5, 2, 64, 2)
    assert back.nn_bytes == h.nn_bytes and back.base_bytes == h.base_bytes
    assert back.version == version


def test_v0_exact_reference_layout():
    """v0 bytes must match the reference's field-by-field big-endian layout."""
    h = _mk(0)
    wire = encode_header(h)
    assert len(wire) == 1 + 1 + 2 + 2 + 1 + 1 + 3 + 4
    assert wire[0] == len(wire)
    assert wire[1] == 1  # split_ratio
    assert int.from_bytes(wire[2:4], "big") == 2048  # width
    assert int.from_bytes(wire[4:6], "big") == 2048  # height
    assert wire[6] == (5 << 4) | 2  # K<<4 | D
    assert wire[7] == (6 << 4) | 2  # log2(64)<<4 | nl
    assert int.from_bytes(wire[8:11], "big") == 21931
    assert int.from_bytes(wire[11:15], "big") == 1234567


def test_v1_feature_flags_roundtrip():
    h = _mk(
        1,
        use_coords=True, embedding=True, use_colors=False, relative=False,
        base_codec="lpc", weight_codec="raw16", precision=24,
    )
    back = decode_header(encode_header(h))
    assert back.use_coords and back.embedding
    assert not back.use_colors and not back.relative
    assert back.base_codec == "lpc" and back.weight_codec == "raw16"
    assert back.precision == 24
    fs = back.feature_spec()
    assert fs.use_coords and fs.embedding and not fs.use_colors


def test_v1_large_dims():
    h = _mk(1, width=100000, height=80000)
    back = decode_header(encode_header(h))
    assert (back.width, back.height) == (100000, 80000)
    with pytest.raises(ValueError):
        encode_header(_mk(0, width=100000))


def test_header_from_config():
    cfg = CodecConfig(K=3, features=FeatureSpec(D=1), model=ModelSpec(base_channel=128))
    h = header_from_config(cfg, 512, 256, [100], [200])
    back = decode_header(encode_header(h))
    assert back.K == 3 and back.D == 1 and back.base_channel == 128
    assert back.model_spec().base_channel == 128


def test_tile_count_mismatch_rejected():
    with pytest.raises(ValueError):
        encode_header(_mk(1, sr=2, nn_bytes=[1], base_bytes=[1, 2, 3, 4]))
