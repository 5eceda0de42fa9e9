"""Real external-codec paths, exercised when the binaries/checkouts exist.

The JPEG XL anchor's real cjxl/djxl band path (eval/anchors.py:162-188),
the external DLPR hook (eval/dlpr_anchor.py::external_dl_codec) and the
BitMore/ABCD `test.py` drivers (eval/bdr_anchors.py) are gated on
binaries absent from this image; without these tests nothing would notice
if the gated code bit-rotted (VERDICT r3 #4).  Each test runs the REAL
path when its dependency is present and skips VISIBLY otherwise:

- cjxl/djxl on PATH            -> real JPEG XL band round trip + sweep
- DLPR checkout (DLPR_REPO)    -> real learned near-lossless block codec
- BITMORE_REPO / ABCD_REPO     -> real external test.py subprocess drive

Installing libjxl (`apt install libjxl-tools` or a cjxl build) unlocks the
first; cloning the anchor repos (+ their weights) and exporting the env
vars unlocks the rest.
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

from lbdrn_msic_tpu.eval.anchors import jpegxl_available
from lbdrn_msic_tpu.eval.bdr_anchors import (
    abcd_command,
    assemble_and_psnr,
    bitmore_command,
    external_repo_dir,
    generate_divs,
    run_external_model,
)
from lbdrn_msic_tpu.eval.dlpr_anchor import (
    dlpr_repo_dir,
    external_dlpr_available,
)
from lbdrn_msic_tpu.utils.synth import synth_scene

needs_cjxl = pytest.mark.skipif(
    not jpegxl_available(),
    reason="cjxl/djxl not on PATH — real JPEG XL anchor path NOT exercised "
    "(install libjxl to enable; the substitute band codec covers the "
    "container/sweep logic meanwhile)",
)
needs_dlpr = pytest.mark.skipif(
    not external_dlpr_available(),
    reason=f"external DLPR checkout not found at {dlpr_repo_dir()!r} — real "
    "learned near-lossless codec NOT exercised (clone "
    "Deep-Lossy-Plus-Residual-Coding and set DLPR_REPO to enable)",
)
needs_bitmore = pytest.mark.skipif(
    external_repo_dir("BITMORE_REPO") is None,
    reason="BITMORE_REPO not set / no test.py there — real BitMore anchor "
    "NOT exercised (clone the BitMore repo + weights and export "
    "BITMORE_REPO to enable)",
)
needs_abcd = pytest.mark.skipif(
    external_repo_dir("ABCD_REPO") is None,
    reason="ABCD_REPO not set / no test.py there — real ABCD anchor NOT "
    "exercised (clone the ABCD repo + weights and export ABCD_REPO "
    "to enable)",
)


@needs_cjxl
def test_jpegxl_real_cli_band_roundtrip():
    """One band through the real cjxl/djxl CLIs (reference SOTA.py:95):
    near-lossless at the reference's tightest distance."""
    from lbdrn_msic_tpu.eval.anchors import _cjxl_band_encode, _djxl_band_decode

    band = synth_scene(64, 64, channels=1, effective_bits=12, seed=7)[0]
    data = _cjxl_band_encode(band, distance=0.01)
    assert len(data) > 0
    rec = _djxl_band_decode(data)
    assert rec.shape == band.shape
    err = np.abs(rec.astype(np.int32) - band.astype(np.int32))
    assert err.max() <= 64  # d=0.01 on 12-bit content is near-lossless


@needs_cjxl
def test_jpegxl_real_container_rd_sweep(tmp_path):
    """The full JPEGXL anchor (per-band container, reference distance
    table, CSV sweep) through the REAL CLIs — no substitute codec."""
    from lbdrn_msic_tpu.eval.anchors import (
        anchor_decode,
        anchor_encode,
        eval_rd,
        sweep_to_csv,
    )

    img = synth_scene(48, 48, channels=4, effective_bits=12, seed=9)
    stream = anchor_encode(img, "JPEGXL", K=1)  # band_codec=None => real CLI
    rec = anchor_decode(stream, "JPEGXL")
    mse, psnr, bits, bpsp = eval_rd(img, stream, rec)
    assert psnr > 45
    loose = anchor_encode(img, "JPEGXL", K=11)
    assert len(loose) < len(stream)  # distance knob is monotone in rate
    out = sweep_to_csv({"s": img}, "JPEGXL", str(tmp_path / "JPEGXL_2rps.csv"),
                       k_min=1, k_max=2)
    assert os.path.getsize(out) > 0


@needs_dlpr
def test_dlpr_real_codec_block_roundtrip():
    """A 3-band block through the REAL DLPR compress/decompress
    (reference DLPR_nll.py:300-370): tau bounds the per-sample error."""
    from lbdrn_msic_tpu.eval.dlpr_anchor import external_dl_codec

    tau = 2
    enc, dec = external_dl_codec(tau)
    block = (synth_scene(64, 64, channels=3, effective_bits=12, seed=3)
             & 0xFF).astype(np.uint16)  # DLPR consumes 8-bit-range planes
    data = enc(block)
    assert len(data) > 0
    rec = dec(data)
    assert rec.shape == block.shape
    err = np.abs(rec.astype(np.int32) - block.astype(np.int32))
    assert err.max() <= tau  # the near-lossless guarantee


@needs_bitmore
def test_bitmore_real_testpy(tmp_path):
    """Drive the real BitMore test.py subprocess with generated divs and
    reassemble its outputs (reference SOTA_BDR.py:155-183)."""
    repo = external_repo_dir("BITMORE_REPO")
    img = synth_scene(64, 64, channels=3, effective_bits=12, seed=11)
    div_dir = str(tmp_path / "div_bitmore")
    generate_divs(img, div_dir, "scene", div_h=2, div_w=2)
    in_bits = 8
    run_external_model(repo, bitmore_command(div_dir, in_bits))
    out_dir = os.path.join(repo, f"results/D16_quant_{in_bits}_16/RSMS",
                           os.path.basename(div_dir))
    _, psnr = assemble_and_psnr(img, out_dir, "scene", in_bits,
                                div_h=2, div_w=2)
    assert np.isfinite(psnr) and psnr > 20


@needs_abcd
def test_abcd_real_testpy(tmp_path):
    """Drive the real ABCD test.py subprocess (reference SOTA_BDR.py:124-147)."""
    repo = external_repo_dir("ABCD_REPO")
    img = synth_scene(64, 64, channels=3, effective_bits=12, seed=13)
    div_dir = str(tmp_path / "div_abcd")
    save_dir = str(tmp_path / "abcd_out")
    generate_divs(img, div_dir, "scene", div_h=2, div_w=2)
    in_bits = 8
    run_external_model(repo, abcd_command(div_dir, save_dir, in_bits))
    _, psnr = assemble_and_psnr(img, save_dir, "scene", in_bits,
                                div_h=2, div_w=2)
    assert np.isfinite(psnr) and psnr > 20


def test_external_command_lines_match_reference():
    """The subprocess command builders must keep the reference's exact
    flag sets (SOTA_BDR.py:124-137, :166-170) so a dropped-in checkout
    runs unmodified — this part needs no external binary."""
    cmd = bitmore_command("div_bitmore", 9, python="python")
    assert cmd == [
        "python", "test.py", "--set_names", "div_bitmore",
        "--type_8_or_16", "1", "--quant", "9", "--quant_end", "16",
        "--dep", "16", "--save_result", "1",
    ]
    cmd = abcd_command("divs", "out", 7, hbd=13, model="swin", python="python")
    assert cmd == [
        "python", "test.py",
        "--config", "configs/test_ABCD/abcd_test-16bits.yaml",
        "--testset_root", "divs", "--save_path", "out",
        "--LBD", "7", "--HBD", "13", "--gpu", "0", "--save", "1",
        "--model", "save/swin_abcd.pth", "--window", "8",
    ]
    with pytest.raises(ValueError):
        abcd_command("d", "o", 7, model="nope")
