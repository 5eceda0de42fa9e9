"""Scale sanity check: larger scenes and band counts on the real chip.

Validates memory behavior (tap-matrix staging, fallbacks), throughput
scaling, and correctness at shapes closer to real Gaofen scenes
(6000^2 x 8 bands) than the unit tests use.

Usage: python scripts/scale_check.py [--sizes 2048 4096] [--channels 4 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="+", default=[2048, 4096])
    p.add_argument("--channels", type=int, nargs="+", default=[4, 8])
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--granule", type=int, default=8)
    p.add_argument("--K", type=int, nargs="+", default=[5])
    p.add_argument(
        "--flagship", action="store_true",
        help="run the real Gaofen scene shapes instead of --sizes/--channels: "
             "GF-6 WFI 6000x6000x8 and GF-2 7815x7605x4 (BASELINE.md)",
    )
    args = p.parse_args()

    from lbdrn_msic_tpu.codec import decode_stream, encode_image, pick_staging
    from lbdrn_msic_tpu.core.config import CodecConfig, TrainSpec
    from lbdrn_msic_tpu.eval.metrics import psnr
    from lbdrn_msic_tpu.utils.synth import synth_scene

    if args.flagship:
        shapes = [(6000, 6000, 8), (7815, 7605, 4)]
    else:
        shapes = [(s, s, c) for c in args.channels for s in args.sizes]

    tspec = TrainSpec(epochs=args.epochs, sample_granule=args.granule)
    for (h, w, c) in shapes:
        img = synth_scene(h, w, channels=c, effective_bits=12, seed=7)
        for K in args.K:
            cfg = CodecConfig(K=K, train=tspec)
            staging, _ = pick_staging(
                h, w, c, int(img.max()) >> K, cfg.features, tspec
            )
            t0 = time.time()
            stream, stats = encode_image(img, cfg)
            t_cold = time.time() - t0
            t0 = time.time()
            stream, stats = encode_image(img, cfg)
            t_enc = time.time() - t0
            t0 = time.time()
            rec, _ = decode_stream(stream)
            t_dec = time.time() - t0
            ok = np.array_equal(rec >> K, img >> K)
            print(
                f"{h}x{w}x{c} K={K} [{staging}]: encode {t_enc:.2f}s "
                f"({h*w/1e6/t_enc:.2f} Mpx/s) decode {t_dec:.2f}s "
                f"({h*w/1e6/t_dec:.2f} Mpx/s) | "
                f"PSNR {psnr(img, rec):.2f} bpsp {stats.bpsp:.3f} | "
                f"msb-lossless={ok} (cold {t_cold:.1f}s, "
                f"train {stats.tiles[0].train_time:.2f}s "
                f"base {stats.tiles[0].base_time:.2f}s)",
                flush=True,
            )
            assert ok
    return 0


if __name__ == "__main__":
    sys.exit(main())
