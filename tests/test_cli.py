"""CLI round-trip tests (encode -> decode -> sweep -> summarize)."""

import csv
import os

import numpy as np

from lbdrn_msic_tpu.cli import decode as decode_cli
from lbdrn_msic_tpu.cli import encode as encode_cli
from lbdrn_msic_tpu.cli import summarize as summarize_cli
from lbdrn_msic_tpu.cli import sweep as sweep_cli
from lbdrn_msic_tpu.io.tiff import read_tiff, write_tiff
from lbdrn_msic_tpu.utils.logging import scrape_log
from lbdrn_msic_tpu.utils.synth import synth_scene

FAST = ["-e", "2", "-bs", "2048"]


def test_encode_decode_cli(tmp_path):
    img = synth_scene(64, 64, channels=2, seed=21)
    tif = str(tmp_path / "scene.tif")
    write_tiff(tif, img)
    out = str(tmp_path / "out")

    assert encode_cli.main(["-i", tif, "-o", out, "-K", "5"] + FAST) == 0
    run_dir = os.path.join(
        out, "scene_r1_K5_bc64_nl2_D2_prec16_lr0.001_bs2048_e2"
    )
    bin_path = os.path.join(run_dir, "scene.bin")
    assert os.path.exists(bin_path)
    enc_log = scrape_log(os.path.join(run_dir, "encode.txt"))
    assert "time" in enc_log and "bpsp" in enc_log

    # idempotency marker: second run must skip
    assert encode_cli.main(["-i", tif, "-o", out, "-K", "5"] + FAST) == 0

    assert decode_cli.main(["-i", bin_path, "-org", tif, "--keep-recon"]) == 0
    dec_log = scrape_log(os.path.join(run_dir, "decode.txt"))
    assert dec_log["psnr"] > 40
    assert dec_log["bytes"] == os.path.getsize(bin_path)

    rec = read_tiff(os.path.join(run_dir, "scene_recon.tif"))
    np.testing.assert_array_equal(rec >> 5, img >> 5)


def test_sweep_and_summarize_cli(tmp_path):
    img = synth_scene(48, 48, channels=2, seed=22)
    tif = str(tmp_path / "tiny.tif")
    write_tiff(tif, img)
    out = str(tmp_path / "out")

    assert sweep_cli.main(
        ["-i", tif, "-o", out, "--k-min", "4", "--k-max", "5"] + FAST
    ) == 0
    assert summarize_cli.main(
        ["-i", "tiny", "-o", out, "--k-min", "4", "--k-max", "5"] + FAST
    ) == 0

    csv_path = os.path.join(out, "results_r1_bc64_nl2_D2_prec16_lr0.001_bs2048_e2.csv")
    with open(csv_path) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["K", "tiny_MSE", "tiny_PSNR", "tiny_bpsp", "tiny_bits"]
    assert [r[0] for r in rows[1:]] == ["K4", "K5"]
    k4 = [float(x) for x in rows[1][1:]]
    k5 = [float(x) for x in rows[2][1:]]
    assert k4[1] > k5[1]  # lower K -> higher PSNR
    assert k4[2] > k5[2]  # lower K -> more bits


def test_anchors_and_report_cli(tmp_path):
    from lbdrn_msic_tpu.cli import anchors as anchors_cli
    from lbdrn_msic_tpu.cli import report as report_cli

    img = synth_scene(48, 48, channels=2, seed=23)
    tif = str(tmp_path / "s.tif")
    write_tiff(tif, img)
    out = str(tmp_path / "sr")
    assert anchors_cli.main(
        ["-i", tif, "-o", out, "-m", "Baseline", "--k-min", "3", "--k-max", "6"]
    ) == 0
    base_csv = os.path.join(out, "Baseline_4rps.csv")
    assert os.path.exists(base_csv)

    # report of baseline against itself: BD ~ 0
    assert report_cli.main(
        ["-t", base_csv, "-a", f"Baseline={base_csv}", "-n", "1", "-k", "4",
         "--plot-dir", str(tmp_path / "plots")]
    ) == 0
    assert os.path.exists(str(tmp_path / "plots" / "rd_image0.png"))


def test_logs_match_reference_scraper_regexes(tmp_path):
    """The reference's results_summary.py regexes (results_summary.py:8-13)
    must find our log lines verbatim."""
    import re

    img = synth_scene(48, 48, channels=2, seed=31)
    tif = str(tmp_path / "r.tif")
    write_tiff(tif, img)
    out = str(tmp_path / "out")
    encode_cli.main(["-i", tif, "-o", out, "-K", "5"] + FAST)
    run_dir = os.path.join(out, "r_r1_K5_bc64_nl2_D2_prec16_lr0.001_bs2048_e2")
    decode_cli.main(
        ["-i", os.path.join(run_dir, "r.bin"), "-org", tif]
    )
    dec = open(os.path.join(run_dir, "decode.txt")).read()
    enc = open(os.path.join(run_dir, "encode.txt")).read()
    assert re.search(r"MSE: (\d+\.\d+)", dec)
    assert re.search(r"PSNR: (\d+\.\d+)", dec)
    assert re.search(r"bpsp=(\d+\.\d+)", dec)
    assert re.search(r"Total size: (\d+) bytes", dec)
    assert re.search(r"Time elapsed: (\d+\.\d+)", dec)
    assert re.search(r"nn: (\d+) bytes", enc)
    assert re.search(r"MSB: (\d+) bytes", enc)
    assert re.search(r"Time elapsed: (\d+\.\d+)", enc)


def test_pipelined_sweep_cli(tmp_path):
    img = synth_scene(48, 48, channels=2, seed=41)
    tif = str(tmp_path / "p.tif")
    write_tiff(tif, img)
    out = str(tmp_path / "out")
    assert sweep_cli.main(
        ["-i", tif, "-o", out, "--k-min", "4", "--k-max", "5", "--pipeline"] + FAST
    ) == 0
    for K in (4, 5):
        run_dir = os.path.join(
            out, f"p_r1_K{K}_bc64_nl2_D2_prec16_lr0.001_bs2048_e2"
        )
        got = scrape_log(os.path.join(run_dir, "decode.txt"))
        assert got["psnr"] > 40
    # resumable: second invocation must be a no-op for encodes
    assert sweep_cli.main(
        ["-i", tif, "-o", out, "--k-min", "4", "--k-max", "5", "--pipeline"] + FAST
    ) == 0


def test_visualize_cli(tmp_path):
    """The visu_image.py-role CLI emits composites, bit-plane views and
    error maps from TIFFs on disk."""
    from lbdrn_msic_tpu.cli import visualize as vz
    from lbdrn_msic_tpu.io.tiff import write_tiff
    from lbdrn_msic_tpu.utils.synth import synth_scene

    img = synth_scene(48, 40, channels=4, effective_bits=12, seed=21)
    src = str(tmp_path / "scene.tif")
    write_tiff(src, img)
    rec = ((img >> 2) << 2).astype(img.dtype)
    rp = str(tmp_path / "rec.tif")
    write_tiff(rp, rec)
    out = str(tmp_path / "figs")
    assert vz.main([
        "-i", src, "-o", out, "--msb-lsb", "5",
        "--recon", f"drop2={rp}",
    ]) == 0
    names = sorted(os.listdir(out))
    assert names == [
        "scene_error_maps.png", "scene_false.png",
        "scene_msb_lsb_K5.png", "scene_true.png",
    ]
    assert all(os.path.getsize(os.path.join(out, n)) > 1000 for n in names)


def test_header_v0_warns_about_body_deviation(tmp_path, capsys):
    """--header-version 0 writes the reference's header byte layout but a
    non-reference body (docs/FORMAT.md deviation record) — the CLI must say
    so loudly so nobody ships a v0 stream expecting reference tooling to
    read it (VERDICT r3 #9)."""
    img = synth_scene(48, 48, channels=2, seed=51)
    tif = str(tmp_path / "v0.tif")
    write_tiff(tif, img)
    out = str(tmp_path / "out")
    assert encode_cli.main(
        ["-i", tif, "-o", out, "-K", "5", "--header-version", "0"] + FAST
    ) == 0
    err = capsys.readouterr().err
    assert "NOT its body wire format" in err
    # default v1 encodes must stay quiet
    assert encode_cli.main(["-i", tif, "-o", out, "-K", "6"] + FAST) == 0
    assert "body wire format" not in capsys.readouterr().err


def test_run_name_suffixes_non_reference_knobs():
    """Default configs keep reference-identical run-dir names; the cosine
    schedule and non-default sampling granule get suffixes so runs don't
    collide with (or resume-skip) differently-configured ones."""
    import dataclasses

    from lbdrn_msic_tpu.core.config import CodecConfig, TrainSpec

    ref = CodecConfig(K=5).run_name("img")
    assert ref == "img_r1_K5_bc64_nl2_D2_prec16_lr0.001_bs8192_e10"
    cos = CodecConfig(K=5, train=TrainSpec(schedule="cosine")).run_name("img")
    g8 = CodecConfig(K=5, train=TrainSpec(sample_granule=8)).run_name("img")
    both = CodecConfig(
        K=5, train=TrainSpec(schedule="cosine", sample_granule=8)
    ).run_name("img")
    assert cos == ref + "_cosine" and g8 == ref + "_g8"
    assert both == ref + "_cosine_g8"
