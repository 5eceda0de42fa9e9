"""TPU-recipe study: beat the reference's RD at (much) less encode time.

The reference's training recipe (Adam + StepLR(gamma=0.1 every e//3), 10
epochs — reference encode.py:84-85) drops the LR to 1e-6 by epoch 9: the
last third of the run barely learns.  The TPU rebuild's fused step is an
order of magnitude faster, so it can afford BOTH a smoother schedule and
more epochs while still encoding faster than the reference's default run.

This script sweeps recipe variants over a synthetic Gaofen-like suite on
the real chip, writes one RD CSV per recipe, and reports each variant's
BD-Rate/BD-PSNR against the reference recipe plus its measured encode
time.  Artifacts land in validation/recipe/ and the summary table in
validation/RECIPE.md.

Usage: python scripts/recipe_study.py [--size 512] [--scenes 3]
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

RECIPES = [
    # (tag, schedule, epochs)
    ("ref_e10", "step", 10),  # the reference's default recipe
    ("cos_e10", "cosine", 10),
    ("cos_e20", "cosine", 20),
    ("cos_e40", "cosine", 40),
]


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--scenes", type=int, default=3)
    p.add_argument("--channels", type=int, default=4)
    p.add_argument("--k-min", type=int, default=1)
    p.add_argument("--k-max", type=int, default=6)
    p.add_argument("--granule", type=int, default=8)
    p.add_argument("--out", type=str, default="validation")
    args = p.parse_args()

    from lbdrn_msic_tpu.codec import decode_stream, encode_pipelined
    from lbdrn_msic_tpu.core.config import CodecConfig, TrainSpec
    from lbdrn_msic_tpu.eval.metrics import PSNR_PEAK
    from lbdrn_msic_tpu.eval.reports import bd_report
    from lbdrn_msic_tpu.utils.synth import synth_scene

    outdir = os.path.join(args.out, "recipe")
    os.makedirs(outdir, exist_ok=True)
    images = {
        f"scene{i}": synth_scene(args.size, args.size, args.channels,
                                 effective_bits=12, seed=100 + i)
        for i in range(args.scenes)
    }
    names = list(images)
    ks = list(range(args.k_min, args.k_max + 1))
    metrics = ["MSE", "PSNR", "bpsp", "bits"]

    csvs, times = {}, {}
    for tag, schedule, epochs in RECIPES:
        jobs, tags = [], []
        for K in ks:
            cfg = CodecConfig(K=K, train=TrainSpec(
                epochs=epochs, sample_granule=args.granule,
                schedule=schedule,
            ))
            for n in names:
                jobs.append((images[n], cfg))
                tags.append((K, n))
        t0 = time.time()
        encoded = encode_pipelined(jobs)
        dt = time.time() - t0
        times[tag] = dt / len(jobs)
        print(f"[{tag}] {len(jobs)} jobs in {dt:.1f}s "
              f"({times[tag]:.2f}s/job)", flush=True)
        rd = {}
        for (K, n), (stream, _) in zip(tags, encoded):
            rec, _ = decode_stream(stream)
            mse = float(np.mean(
                (images[n].astype(np.float32) - rec.astype(np.float32)) ** 2
            ))
            psnr = 10 * np.log10(PSNR_PEAK**2 / mse) if mse else float("inf")
            bits = 8 * len(stream)
            rd[(K, n)] = [mse, psnr, bits / images[n].size, bits]
        path = os.path.join(outdir, f"{tag}.csv")
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["K"] + [f"{n}_{m}" for n in names for m in metrics])
            for K in ks:
                w.writerow([f"K{K}"] + sum((rd[(K, n)] for n in names), []))
        csvs[tag] = path

    ref_tag = RECIPES[0][0]
    lines = [
        "# TPU training-recipe study",
        "",
        "BD-Rate / BD-PSNR of each recipe against the reference recipe",
        f"(StepLR, 10 epochs — reference encode.py:84-85), measured on "
        f"{args.scenes} synthetic {args.size}x{args.size}x{args.channels} "
        f"scenes, K={args.k_min}..{args.k_max}, sample_granule="
        f"{args.granule}.  Encode time is per (image, K) job, pipelined, "
        "on one v5e chip.  Reproduce: `python scripts/recipe_study.py`.",
        "",
        "| recipe | schedule | epochs | BD-Rate vs ref | BD-PSNR | s/job |",
        "|---|---|---|---|---|---|",
    ]
    for tag, schedule, epochs in RECIPES:
        if tag == ref_tag:
            lines.append(
                f"| {tag} | {schedule} | {epochs} | — | — | {times[tag]:.2f} |"
            )
            continue
        r = bd_report(csvs[ref_tag], csvs[tag], n_images=len(names),
                      k_points=len(ks))
        print(f"{tag}: BD-Rate {r.group_rate['all']:+.3f} %  "
              f"BD-PSNR {r.group_psnr['all']:+.3f} dB  "
              f"{times[tag]:.2f}s/job", flush=True)
        lines.append(
            f"| {tag} | {schedule} | {epochs} | "
            f"{r.group_rate['all']:+.3f} % | "
            f"{r.group_psnr['all']:+.3f} dB | {times[tag]:.2f} |"
        )
    md = os.path.join(args.out, "RECIPE.md")
    with open(md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {md}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
