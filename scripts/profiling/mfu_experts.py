"""Expert-batched training-step MFU vs expert count (VERDICT r4 #7).

docs/PERF.md argues "the expert axis is the lever" for the ~11k-param MLP
(single-network utilization is ~3 % MFU — the MXU is latency-bound at
B=8192 x F=128 x bc=64 matmuls).  This measures it: time
`fit_rate_experts` end-to-end at E in {1, 4, 8, 16} on one 2048^2 x 4
scene and convert step rate to model-FLOP utilization.

    python scripts/profiling/mfu_experts.py [--size 2048] [--epochs 10]

FLOP accounting (per expert, per step, B=8192 samples):
  forward matmuls: 2B * (128*64 + 64*64 + 64*4) = 2B * 12544
  training step (fwd + grad-of-matmuls): ~3x forward = 6B * 12544
Eval epochs add forward-only passes over the whole image; they are
counted with the same model (n_eval_samples * 2 * 12544) so the MFU
figure is end-to-end (staging gathers, evals and optimizer included —
a lower bound on pure-kernel MFU).  Peak: v5e bf16 394 TFLOP/s; the
fused Pallas kernel computes f32 (peak 197 TFLOP/s) — both columns
printed.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import numpy as np

PEAK_BF16 = 394e12
PEAK_F32 = 197e12


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=2048)
    p.add_argument("--channels", type=int, default=4)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--granule", type=int, default=8)
    p.add_argument("--experts", type=int, nargs="+", default=[1, 4, 8, 16])
    args = p.parse_args()

    from lbdrn_msic_tpu.core.config import (
        CodecConfig,
        FeatureSpec,
        ModelSpec,
        TrainSpec,
    )
    from lbdrn_msic_tpu.models.siren import pad_dim
    from lbdrn_msic_tpu.train.loop import fit_rate_experts
    from lbdrn_msic_tpu.utils.synth import synth_scene
    from lbdrn_msic_tpu.utils.transfer import put_image

    H = W = args.size
    C = args.channels
    cfg = CodecConfig(
        train=TrainSpec(epochs=args.epochs, sample_granule=args.granule)
    )
    fspec, mspec, tspec = cfg.features, cfg.model, cfg.train
    img = synth_scene(H, W, channels=C, effective_bits=12, seed=7)
    dev_img = put_image(img)

    dim_in = fspec.feature_dim(C)
    padded_in = pad_dim(dim_in)
    bc = mspec.base_channel
    # per-sample forward matmul FLOPs (MACs x 2), padded shapes as run
    layer_flops = 2 * (
        padded_in * bc
        + (mspec.num_layers - 1) * bc * bc
        + bc * C
    )
    n = H * W
    bs = min(tspec.batch_size, n)
    g = max(1, tspec.sample_granule)
    n_g = -(-n // g)
    steps_per_epoch = -(-n_g // (bs // g))
    n_evals = args.epochs  # eval every epoch (val_duration 1)
    train_flops_e = 3 * layer_flops * bs * steps_per_epoch * args.epochs
    eval_flops_e = layer_flops * n * n_evals
    flops_per_expert = train_flops_e + eval_flops_e

    from lbdrn_msic_tpu.features.engine import tap_matrix_dtype

    max_msb = int(img.max())
    print(f"scene {H}x{W}x{C}, bs={bs}, {steps_per_epoch} steps/epoch x "
          f"{args.epochs} epochs, {flops_per_expert / 1e12:.2f} TFLOP/expert")
    print(f"{'E':>3} {'wall s':>8} {'steps/s':>9} {'Msamp/s':>9} "
          f"{'TFLOP/s':>8} {'MFU bf16':>9} {'MFU f32':>8}")
    for E in args.experts:
        # identical K=5 experts: int8 taps keep FULL staging inside the
        # budget up to E=16 (16 x 420 MB) — the dataset path's fast mode;
        # per-expert math is K-independent so timing is representative
        Ks = (5,) * E
        dts = tuple(
            np.dtype(tap_matrix_dtype(max_msb >> k, fspec.relative)).name
            for k in Ks
        )
        key = jax.random.PRNGKey(0)

        def run():
            res = fit_rate_experts(
                dev_img, Ks, key, fspec, mspec, tspec, H, W, C, dts,
                use_fused=jax.default_backend() != "cpu",
                staging="full",
            )
            jax.block_until_ready(res.params)
            # block_until_ready is unreliable on this backend: fetch a scalar
            float(np.asarray(res.best_mse).sum())

        run()  # compile
        best = min(
            (lambda t0: (run(), time.time() - t0)[1])(time.time())
            for _ in range(2)
        )
        total_steps = steps_per_epoch * args.epochs
        fl = flops_per_expert * E
        print(f"{E:>3} {best:>8.2f} {total_steps / best:>9.1f} "
              f"{E * bs * total_steps / best / 1e6:>9.1f} "
              f"{fl / best / 1e12:>8.2f} "
              f"{fl / best / PEAK_BF16 * 100:>8.1f}% "
              f"{fl / best / PEAK_F32 * 100:>7.1f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
