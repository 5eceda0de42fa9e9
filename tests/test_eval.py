"""Anchor codecs, BD metrics, and report tests.

The BD implementation is validated against the reference's shipped result
CSVs (read directly from the read-only reference snapshot): the group
BD-Rate/BD-PSNR numbers must reproduce the values recomputed with the
reference's own BD code (SURVEY §6 table).
"""

import os

import numpy as np
import pytest

from lbdrn_msic_tpu.eval import anchors
from lbdrn_msic_tpu.eval.metrics import bd_psnr, bd_rate, bpsp, psnr
from lbdrn_msic_tpu.eval.reports import bd_report, bd_table_markdown, rd_plot
from lbdrn_msic_tpu.utils.synth import synth_scene

REF_RESULTS = "/root/reference/SOTA_results"


def test_psnr_bpsp():
    a = np.full((2, 4, 4), 100, np.uint16)
    b = np.full((2, 4, 4), 110, np.uint16)
    assert abs(psnr(a, b) - 10 * np.log10(1e8 / 100)) < 1e-6
    assert psnr(a, a) == float("inf")
    assert bpsp(100, (4, 100, 100)) == 100 * 8 / 40000


@pytest.mark.parametrize("method", ["Baseline", "JPEG2000star", "JPEG2000"])
def test_anchor_roundtrip(method):
    img = synth_scene(96, 80, channels=4, effective_bits=12, seed=31)
    stream = anchors.anchor_encode(img, method, K=5)
    rec = anchors.anchor_decode(stream, method)
    assert rec.shape == img.shape
    if method == "Baseline":
        np.testing.assert_array_equal(rec, (img >> 5) << 5)
    else:
        assert psnr(img, rec) > 40


def test_jpeg2000star_beats_baseline():
    img = synth_scene(128, 128, channels=4, effective_bits=12, seed=32)
    K = 5
    s_base = anchors.anchor_encode(img, "Baseline", K)
    s_star = anchors.anchor_encode(img, "JPEG2000star", K)
    p_base = psnr(img, anchors.anchor_decode(s_base, "Baseline"))
    p_star = psnr(img, anchors.anchor_decode(s_star, "JPEG2000star"))
    assert p_star > p_base  # lossy-coded LSBs beat zeroed LSBs


def test_jpegxl_gated():
    if anchors.jpegxl_available():
        pytest.skip("cjxl present; gating not exercised")
    img = synth_scene(32, 32, channels=1, seed=33)
    with pytest.raises(RuntimeError, match="cjxl"):
        anchors.anchor_encode(img, "JPEGXL", K=1)


def test_jpegxl_substitute_roundtrip():
    """The JPEGXL slot's container/sweep path driven end-to-end with the
    in-repo substitute band codec (no cjxl/djxl needed)."""
    img = synth_scene(72, 56, channels=4, effective_bits=12, seed=34)
    codec = anchors.jxl_substitute_band_codec()
    streams = {
        K: anchors.anchor_encode(img, "JPEGXL", K, jxl_band_codec=codec)
        for K in (1, 5, 11)
    }
    psnrs, sizes = {}, {}
    for K, s in streams.items():
        rec = anchors.anchor_decode(s, "JPEGXL", jxl_band_codec=codec)
        assert rec.shape == img.shape and rec.dtype == np.uint16
        psnrs[K], sizes[K] = psnr(img, rec), len(s)
    # the distance table is monotone -> PSNR falls, size falls with K
    assert psnrs[1] > psnrs[5] > psnrs[11]
    # extreme distance override clamps to the 2-byte step field, no overflow
    enc, dec = codec
    blob = enc(img[0], 40.0)
    assert dec(blob).shape == img[0].shape
    assert sizes[1] > sizes[5] > sizes[11]
    # container layout matches the reference's (header_len, n_bands, sizes)
    s = streams[5]
    assert s[0] == 2 + 4 * (img.shape[0] - 1) and s[1] == img.shape[0]


def test_jpegxl_substitute_sweep_csv(tmp_path):
    img = synth_scene(48, 40, channels=2, effective_bits=12, seed=35)
    out = anchors.sweep_to_csv(
        {"s": img}, "JPEGXL", str(tmp_path / "JPEGXLsub_3rps.csv"),
        k_min=1, k_max=3, jxl_band_codec=anchors.jxl_substitute_band_codec(),
    )
    with open(out) as f:
        lines = f.read().strip().splitlines()
    assert lines[0] == "K,s_MSE,s_PSNR,s_bpsp,s_bits"
    assert len(lines) == 4 and lines[1].startswith("K1,")


def test_anchor_sweep_csv(tmp_path):
    imgs = {"tiny": synth_scene(48, 48, channels=2, effective_bits=12, seed=34)}
    out = anchors.sweep_to_csv(imgs, "Baseline", str(tmp_path / "b.csv"),
                               k_min=3, k_max=5)
    import csv

    rows = list(csv.reader(open(out)))
    assert rows[0] == ["K", "tiny_MSE", "tiny_PSNR", "tiny_bpsp", "tiny_bits"]
    assert len(rows) == 4
    assert float(rows[1][2]) > float(rows[3][2])  # K3 PSNR > K5 PSNR


@pytest.mark.skipif(not os.path.isdir(REF_RESULTS), reason="reference CSVs absent")
def test_bd_reproduces_reference_numbers():
    """Group BD-Rate/BD-PSNR vs Baseline must match the values obtained by
    running the reference's own BD_RATE/BD_PSNR over its shipped CSVs
    (recomputed in SURVEY §6: GF-2 -19.589 % / WFI -19.576 % / PMS -15.158 %,
    BD-PSNR +6.237 / +6.445 / +5.520 dB)."""
    lbdrn_csv = os.path.join(
        REF_RESULTS, "results_r1_bc64_nl2_D2_prec16_lr0.001_bs8192_e10.csv"
    )
    base_csv = os.path.join(REF_RESULTS, "Baseline_11rps.csv")
    groups = {"GF-2": range(0, 5), "WFI": range(5, 9), "PMS": range(9, 13)}
    r = bd_report(base_csv, lbdrn_csv, n_images=13, k_points=6, groups=groups)
    assert abs(r.group_rate["GF-2"] - (-19.589)) < 2e-3
    assert abs(r.group_rate["WFI"] - (-19.576)) < 2e-3
    assert abs(r.group_rate["PMS"] - (-15.158)) < 2e-3
    assert abs(r.group_psnr["GF-2"] - 6.237) < 2e-3
    assert abs(r.group_psnr["WFI"] - 6.445) < 2e-3
    assert abs(r.group_psnr["PMS"] - 5.520) < 2e-3


@pytest.mark.skipif(not os.path.isdir(REF_RESULTS), reason="reference CSVs absent")
def test_bd_table_and_plot(tmp_path):
    lbdrn_csv = os.path.join(
        REF_RESULTS, "results_r1_bc64_nl2_D2_prec16_lr0.001_bs8192_e10.csv"
    )
    anchors_map = {
        "Baseline": os.path.join(REF_RESULTS, "Baseline_11rps.csv"),
        "JPEG2000": os.path.join(REF_RESULTS, "JPEG2000_11rps.csv"),
    }
    groups = {"GF-2": range(0, 5)}
    md = bd_table_markdown(anchors_map, lbdrn_csv, 13, groups)
    assert "Baseline" in md and "-19.589" in md
    png = rd_plot(
        {"LBDRN": lbdrn_csv, **anchors_map}, 0, str(tmp_path / "rd.png"), 13
    )
    assert os.path.getsize(png) > 1000


def test_bd_piecewise_mode():
    r1 = [100, 200, 400, 800]
    p1 = [30.0, 35.0, 40.0, 45.0]
    r2 = [90, 180, 360, 720]
    p2 = [30.5, 35.5, 40.5, 45.5]
    cubic = bd_rate(r1, p1, r2, p2)
    pw = bd_rate(r1, p1, r2, p2, piecewise=True)
    assert cubic < 0 and pw < 0  # test curve is better
    assert abs(cubic - pw) < 5
    assert bd_psnr(r1, p1, r2, p2) > 0


def test_error_stats_table():
    from lbdrn_msic_tpu.eval.reports import error_stats_table

    org = synth_scene(32, 32, channels=2, seed=50)
    rec = ((org >> 2) << 2).astype(np.uint16)
    md = error_stats_table(org, {"drop2": rec, "exact": org})
    lines = md.splitlines()
    assert lines[0].startswith("| Method | max |")
    assert "| exact | 0 | 100.000" in md
    tex = error_stats_table(org, {"exact": org}, fmt="latex")
    assert tex.startswith("\\begin{tabular}") and "exact & 0 & 100.000" in tex
    # headers must be LaTeX-safe: raw '%' comments out the row terminator
    assert "\\%" in tex and "$\\le$" in tex
    header = tex.splitlines()[1]
    assert "%" not in header.replace("\\%", "")


@pytest.mark.skipif(not os.path.isdir(REF_RESULTS), reason="reference CSVs absent")
def test_ablation_table(tmp_path):
    from lbdrn_msic_tpu.eval.reports import ablation_table_markdown

    lbdrn_csv = os.path.join(
        REF_RESULTS, "results_r1_bc64_nl2_D2_prec16_lr0.001_bs8192_e10.csv"
    )
    md = ablation_table_markdown(
        {"default": lbdrn_csv},
        os.path.join(REF_RESULTS, "Baseline_11rps.csv"),
        13, {"GF-2": range(0, 5)},
    )
    assert "-19.589" in md
