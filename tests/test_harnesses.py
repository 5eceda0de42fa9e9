"""BDR/DLPR anchor harnesses (with mock external codecs) and visualization."""

import os

import numpy as np
import pytest

from lbdrn_msic_tpu.eval import bdr_anchors, dlpr_anchor
from lbdrn_msic_tpu.utils.synth import synth_scene


def test_bdr_divs_roundtrip(tmp_path):
    """Div generation + reassembly with a mock identity model."""
    cv2 = pytest.importorskip("cv2")
    img = synth_scene(100, 90, channels=6, effective_bits=12, seed=41)
    d = str(tmp_path / "divs")
    paths = bdr_anchors.generate_divs(img, d, "scene", div_h=3, div_w=2)
    assert len(paths) == 3 * 2 * 2  # 6 bands -> 2 triples

    # mock external model: identity pass-through
    for p in paths:
        tile = cv2.imread(p, cv2.IMREAD_UNCHANGED)
        cv2.imwrite(p.replace(".png", "_output.png"), tile)

    bgr, full = bdr_anchors.assemble_and_psnr(
        img, d, "scene", in_bits=16, div_h=3, div_w=2
    )
    assert bgr == float("inf") or bgr > 90  # identity recon
    assert full > 90 or full == float("inf")


def test_bdr_grid_csv(tmp_path):
    out = str(tmp_path / "grid.csv")
    results = {"a": {8: 50.0, 10: 60.0}, "b": {8: 51.0, 10: 61.0}}
    bdr_anchors.psnr_grid_to_csv(results, out, [8, 10])
    rows = open(out).read().splitlines()
    assert rows[0] == "in_bits,a,b"
    assert rows[1] == "10,60.0,61.0"  # descending in_bits


def test_bdr_external_repo_gated(tmp_path):
    with pytest.raises(RuntimeError, match="external anchor repo"):
        bdr_anchors.run_external_model(str(tmp_path / "nope"), ["true"])


def test_dlpr_hybrid_with_mock_codec():
    """Blocking + container round trip with a mock tau-quantizer codec."""
    img = synth_scene(64, 80, channels=5, effective_bits=12, seed=42)

    def make_codec(tau):
        q = tau + 1

        def enc(block):
            return bytes(np.ascontiguousarray((block // q).astype(np.uint16)).tobytes()) + \
                np.asarray(block.shape, np.uint16).tobytes()

        def dec(data):
            shape = np.frombuffer(data[-6:], np.uint16)
            arr = np.frombuffer(data[:-6], np.uint16).reshape(tuple(shape))
            return (arr * q).astype(np.uint16)

        return enc, dec

    def extra_enc(bands):
        return np.asarray(bands.shape, np.uint16).tobytes() + bands.tobytes()

    def extra_dec(data):
        shape = tuple(np.frombuffer(data[:6], np.uint16))
        return np.frombuffer(data[6:], np.uint16).reshape(shape)

    enc, dec = make_codec(0)  # tau=0 -> lossless mock
    stream = dlpr_anchor.encode_hybrid(img, enc, extra_enc)
    rec = dlpr_anchor.decode_hybrid(stream, dec, extra_dec)
    np.testing.assert_array_equal(rec, img)


def test_dlpr_sweep_csv(tmp_path):
    img = synth_scene(48, 48, channels=4, effective_bits=10, seed=43)

    def make_codec(tau):
        q = 2 * tau + 1

        def enc(block):
            return np.asarray(block.shape, np.uint16).tobytes() + \
                (block // q).astype(np.uint16).tobytes()

        def dec(data):
            shape = tuple(np.frombuffer(data[:6], np.uint16))
            arr = np.frombuffer(data[6:], np.uint16).reshape(shape)
            return np.minimum(arr.astype(np.uint32) * q + tau, 65535).astype(np.uint16)

        return enc, dec

    def extra_enc(bands):
        return bands.tobytes()

    def extra_dec(data):
        return np.frombuffer(data, np.uint16).reshape(1, 48, 48)

    out = dlpr_anchor.sweep_rd(
        {"s": img}, [0, 2], make_codec, extra_enc, extra_dec,
        str(tmp_path / "dlpr.csv"),
    )
    rows = open(out).read().splitlines()
    assert rows[0] == "tau,s_MSE,s_PSNR,s_bpsp,s_bits"
    p0 = float(rows[1].split(",")[2])
    p2 = float(rows[2].split(",")[2])
    assert p0 > p2  # tau=0 closer to lossless


def test_dlpr_results_to_csv(tmp_path):
    out = dlpr_anchor.results_to_csv(
        ["a"], np.asarray([[50.0, 45.0]]), np.asarray([[0.5, 0.3]]), [1000],
        str(tmp_path / "r.csv"),
    )
    rows = open(out).read().splitlines()
    assert len(rows) == 3 and rows[1].startswith("P1,")


def test_visualize(tmp_path):
    from lbdrn_msic_tpu.utils import visualize

    img = synth_scene(64, 64, channels=4, effective_bits=12, seed=44)
    p1 = visualize.save_composite(img, str(tmp_path / "rgb.png"))
    p2 = visualize.msb_lsb_figure(img, 5, str(tmp_path / "msblsb.png"))
    rec = ((img >> 3) << 3).astype(np.uint16)
    p3 = visualize.error_map_grid(img, {"baseline": rec, "perfect": img},
                                  str(tmp_path / "err.png"))
    for p in (p1, p2, p3):
        assert os.path.getsize(p) > 500
