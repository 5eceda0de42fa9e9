"""End-to-end RD validation on a synthetic Gaofen-like suite.

Reproduces the reference's headline experiment shape (run.sh sweep + SOTA
anchors + BD report) without the LFS-absent Gaofen data: synthesizes a
small multi-scene suite, sweeps the LBDRN codec and the classical anchors
over K rate points, writes the canonical CSVs, and prints the BD-Rate /
BD-PSNR of the codec against each anchor.  The codec should land clearly
negative BD-Rate vs Baseline (the reference reports about -15..-20 % on
real Gaofen scenes, SURVEY §6).

Usage: python scripts/rd_validation.py [--size 512] [--scenes 3]
       [--k-min 1] [--k-max 6] [--out validation]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--scenes", type=int, default=3)
    p.add_argument("--channels", type=int, default=4)
    p.add_argument("--k-min", type=int, default=1)
    p.add_argument("--k-max", type=int, default=6)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--granule", type=int, default=8)
    p.add_argument("--out", type=str, default="validation")
    args = p.parse_args()

    from lbdrn_msic_tpu.codec import decode_stream, encode_image
    from lbdrn_msic_tpu.core.config import CodecConfig, TrainSpec
    from lbdrn_msic_tpu.eval import anchors
    from lbdrn_msic_tpu.eval.metrics import PSNR_PEAK
    from lbdrn_msic_tpu.eval.reports import bd_report
    from lbdrn_msic_tpu.utils.synth import synth_scene

    os.makedirs(args.out, exist_ok=True)
    images = {
        f"scene{i}": synth_scene(args.size, args.size, args.channels,
                                 effective_bits=12, seed=100 + i)
        for i in range(args.scenes)
    }
    names = list(images)
    ks = list(range(args.k_min, args.k_max + 1))

    # --- LBDRN sweep (pipelined across all (K, scene) jobs)
    from lbdrn_msic_tpu.codec import encode_pipelined

    lbdrn_csv = os.path.join(args.out, "lbdrn_results.csv")
    metrics = ["MSE", "PSNR", "bpsp", "bits"]
    jobs, tags = [], []
    for K in ks:
        cfg = CodecConfig(
            K=K, train=TrainSpec(epochs=args.epochs, sample_granule=args.granule)
        )
        for n in names:
            jobs.append((images[n], cfg))
            tags.append((K, n))
    t0 = time.time()
    encoded = encode_pipelined(jobs)
    print(f"[lbdrn] pipelined encode of {len(jobs)} jobs: {time.time()-t0:.1f}s",
          flush=True)
    rd = {}
    for (K, n), (stream, _) in zip(tags, encoded):
        rec, _ = decode_stream(stream)
        mse = float(np.mean(
            (images[n].astype(np.float32) - rec.astype(np.float32)) ** 2
        ))
        psnr = 10 * np.log10(PSNR_PEAK**2 / mse) if mse else float("inf")
        bits = 8 * len(stream)
        rd[(K, n)] = [mse, psnr, bits / images[n].size, bits]
        print(f"[lbdrn] {n} K={K}: {psnr:.2f} dB {bits/images[n].size:.3f} bpsp",
              flush=True)
    with open(lbdrn_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["K"] + [f"{n}_{m}" for n in names for m in metrics])
        for K in ks:
            row = [f"K{K}"]
            for n in names:
                row += rd[(K, n)]
            w.writerow(row)

    # --- anchors
    anchor_csvs = {}
    for method in ("Baseline", "JPEG2000star", "JPEG2000"):
        path = os.path.join(args.out, f"{method}_{len(ks)}rps.csv")
        print(f"[anchors] {method}", flush=True)
        anchors.sweep_to_csv(images, method, path, args.k_min, args.k_max)
        anchor_csvs[method] = path

    # --- BD report
    print("\n== BD of LBDRN-MSIC-TPU vs anchors "
          f"({args.scenes} synthetic scenes, K={args.k_min}..{args.k_max}) ==")
    for method, path in anchor_csvs.items():
        r = bd_report(path, lbdrn_csv, n_images=len(names), k_points=len(ks))
        print(f"vs {method:13s}: BD-Rate {r.group_rate['all']:+.3f} %  "
              f"BD-PSNR {r.group_psnr['all']:+.3f} dB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
