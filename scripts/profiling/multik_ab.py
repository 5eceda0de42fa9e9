"""A/B the fused multi-step chunk size against remote-runtime variance.

Times fit (bench config, 1 eval) at multi_k in {0, 4, 16, 64}, in two
interleaved rounds, printing every sample — variance between rounds is
runtime noise, a consistent ordering is signal.
"""

import time

import jax
import jax.numpy as jnp

from lbdrn_msic_tpu.core.config import FeatureSpec, ModelSpec, TrainSpec
from lbdrn_msic_tpu.features.engine import lsb_scale
from lbdrn_msic_tpu.train.loop import fit
from lbdrn_msic_tpu.utils.synth import synth_scene


def main():
    H = W = 2048
    C, K, g = 4, 5, 8
    fspec = FeatureSpec()
    mspec = ModelSpec()
    img = synth_scene(H, W, channels=C, effective_bits=12, seed=42)
    dev = jnp.asarray(img)

    from lbdrn_msic_tpu.codec import _prepare_tile

    plane, plane_scale, labels = _prepare_tile(dev, K, fspec.D)
    label_scale = jnp.float32(lsb_scale(K))
    tspec = TrainSpec(sample_granule=g, val_every=10)

    def run(mk):
        r = fit(
            plane, plane_scale, labels, label_scale,
            jax.random.PRNGKey(0), fspec, mspec, tspec, H, W, C,
            staging="cached", tap_dtype="float32", use_fused=True,
            multi_k=mk,
        )
        return float(r.best_mse)

    variants = (0, 4, 16, 64)
    for mk in variants:  # compile
        run(mk)
    for rnd in range(3):
        for mk in variants:
            t0 = time.time()
            run(mk)
            print(f"round {rnd} multi_k={mk:>2}: {(time.time()-t0)*1e3:7.1f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
