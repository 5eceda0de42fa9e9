"""Drive the BitMore/ABCD and DLPR anchor harnesses END-TO-END with real
(simple, fully in-repo) substitute codecs.

The reference's learned anchors live in external repos with checkpoints
that are absent from this runtime (reference SOTA_BDR.py:35-251,
DLPR_nll.py:300-664).  Their harnesses here (eval/bdr_anchors.py,
eval/dlpr_anchor.py) are unit-tested with mocks; this script additionally
exercises every stage — div tiling, PNG round-trips, reassembly, masking,
3000x3000 blocking, hybrid container, RD sweep, CSV emission — with
genuine codecs, producing real (if deliberately weak) anchor columns:

- BitMore/ABCD slot: the classical half-step bit-depth-recovery baseline
  (mask to in_bits, restore the dropped LSB range's midpoint).  Any learned
  model must beat this; the grid CSV has the reference's test_* shape.
- DLPR slot: a near-lossless substitute — uniform quantization with bin
  half-width tau (the same |error| <= tau guarantee DLPR offers) over the
  first 3 bands, indices coded losslessly by the in-repo LPC coder; extra
  bands LPC-lossless.  tau=0 is exactly lossless.
- JPEGXL slot: the per-band container/sweep path (reference SOTA.py:86-115)
  driven with eval.anchors.jxl_substitute_band_codec (uniform quantizer +
  LPC); emits JPEGXLsub_11rps.csv in the reference CSV schema.

Usage: python scripts/substitute_anchors.py [--size 256] [--scenes 2]
       [--out validation]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def halfstep_model(div_dir: str, in_bits: int) -> None:
    """The classical BDR baseline as a drop-in 'external model': read each
    div PNG, mask to in_bits, set the dropped range's midpoint, write the
    _output.png the reassembler expects."""
    import cv2

    for fn in sorted(os.listdir(div_dir)):
        if not fn.endswith(".png") or fn.endswith("_output.png"):
            continue
        p = os.path.join(div_dir, fn)
        tile = cv2.imread(p, cv2.IMREAD_UNCHANGED)
        mask = np.uint16(int("1" * in_bits + "0" * (16 - in_bits), 2))
        half = np.uint16(1 << (16 - in_bits - 1)) if in_bits < 16 else np.uint16(0)
        out = (tile & mask) | half
        cv2.imwrite(p.replace(".png", "_output.png"), out)


def make_quantize_lpc_codec(tau: int):
    """(encode, decode) near-lossless block codec: |x - rec| <= tau."""
    from lbdrn_msic_tpu.codecs import lpc

    q = 2 * tau + 1

    def enc(block: np.ndarray) -> bytes:
        idx = ((block.astype(np.int32) + tau) // q).astype(np.uint16)
        return bytes([tau]) + lpc.encode(idx)

    def dec(data: bytes) -> np.ndarray:
        t = data[0]
        idx = lpc.decode(data[1:]).astype(np.int32)
        return np.clip(idx * (2 * t + 1), 0, 65535).astype(np.uint16)

    return enc, dec


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--scenes", type=int, default=2)
    p.add_argument("--channels", type=int, default=4)
    p.add_argument("--out", type=str, default="validation")
    p.add_argument("--in-bits", type=int, nargs="*", default=list(range(8, 13)))
    p.add_argument("--taus", type=int, nargs="*", default=[0, 1, 2, 5, 10, 20])
    args = p.parse_args()

    from lbdrn_msic_tpu.codecs import lpc
    from lbdrn_msic_tpu.eval.bdr_anchors import evaluate_bdr_anchor
    from lbdrn_msic_tpu.eval.dlpr_anchor import sweep_rd
    from lbdrn_msic_tpu.utils.synth import synth_scene

    os.makedirs(args.out, exist_ok=True)
    images = {
        f"scene{i}": synth_scene(
            args.size, args.size, args.channels, effective_bits=12, seed=100 + i
        )
        for i in range(args.scenes)
    }

    bdr_csv = os.path.join(args.out, "test_bdr_halfstep.csv")
    with tempfile.TemporaryDirectory() as work:
        evaluate_bdr_anchor(
            images, args.in_bits, bdr_csv, halfstep_model, work
        )
    print(f"wrote {bdr_csv}")

    dlpr_csv = os.path.join(args.out, "DLPR_substitute_rd.csv")
    sweep_rd(
        images,
        args.taus,
        make_quantize_lpc_codec,
        extra_encode=lambda a: lpc.encode(a.astype(np.uint16)),
        extra_decode=lambda b: lpc.decode(b),
        out_csv=dlpr_csv,
    )
    print(f"wrote {dlpr_csv}")

    from lbdrn_msic_tpu.eval.anchors import jxl_substitute_band_codec, sweep_to_csv

    jxl_csv = os.path.join(args.out, "JPEGXLsub_11rps.csv")
    sweep_to_csv(images, "JPEGXL", jxl_csv,
                 jxl_band_codec=jxl_substitute_band_codec())
    print(f"wrote {jxl_csv}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
