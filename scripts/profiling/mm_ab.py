"""A/B the fused kernel's matmul precision on the real chip.

Times the production `fit` (bench config: 2048^2 x 4, K=5, bs=8192, e=10,
g=8, cached staging) with mm_dtype None (full-f32 multi-pass MXU matmuls)
vs "bfloat16" (single-pass with f32 accumulation), and reports each run's
converged best full-image MSE so the RD cost of bf16 is visible next to
its speed.  Run from anywhere with the axon env.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from lbdrn_msic_tpu.core.config import FeatureSpec, ModelSpec, TrainSpec
from lbdrn_msic_tpu.features.engine import lsb_scale
from lbdrn_msic_tpu.train.loop import fit
from lbdrn_msic_tpu.utils.synth import synth_scene


def main():
    H = W = 2048
    C, K = 4, 5
    fspec, mspec = FeatureSpec(), ModelSpec()
    tspec = TrainSpec(sample_granule=8)
    img = synth_scene(H, W, channels=C, effective_bits=12, seed=42)

    from lbdrn_msic_tpu.codec import _prepare_tile

    plane, plane_scale, labels = _prepare_tile(jnp.asarray(img), K, fspec.D)
    label_scale = jnp.float32(lsb_scale(K))

    for mmd in (None, "bfloat16"):
        best = float("inf")
        mse = None
        for _ in range(3):
            t0 = time.time()
            r = fit(plane, plane_scale, labels, label_scale,
                    jax.random.PRNGKey(0), fspec, mspec, tspec, H, W, C,
                    staging="cached", tap_dtype="float32",
                    use_fused=True, mm_dtype=mmd)
            mse = float(r.best_mse)
            best = min(best, time.time() - t0)
        psnr_proxy = 10 * np.log10(1.0 / mse) if mse else float("inf")
        print(f"mm_dtype={mmd!s:>9}: fit {best*1e3:7.1f} ms  "
              f"best_mse {mse:.6e} ({psnr_proxy:.2f} dB on unit scale)",
              flush=True)


if __name__ == "__main__":
    main()
