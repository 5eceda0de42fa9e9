"""Where does the single-image encode's train time go? (round-3 profiling)

Times, on the real chip, the bench configuration (2048^2 x 4, K=5, bc=64,
nl=2, bs=8192, e=10, g=8, cached staging):

  fit_e10_v1      the production program (512 steps x 10 epochs + 10 evals)
  fit_e10_v10     same with one eval (epoch 10 only) -> eval marginal cost
  steps512_fixed  512 fused steps on ONE prebuilt batch (no gather)
  steps512_gather 512 fused steps with the cached-row gather per step
  eval_once       one full-image dataset_mse over the feature cache
  build_cache     feature-cache staging cost (part of dispatch, overlapped)

Each phase is one jitted program; timed by fetching a scalar (d2h of more
than a scalar is ~20 MB/s on the dev tunnel).  Run from /root/repo.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from lbdrn_msic_tpu.core.config import FeatureSpec, ModelSpec, TrainSpec
from lbdrn_msic_tpu.features.engine import (
    build_feature_cache,
    build_granule_labels,
    lsb_scale,
)
from lbdrn_msic_tpu.models.siren import init_params, pad_dim
from lbdrn_msic_tpu.ops.fused_step import fused_train_step
from lbdrn_msic_tpu.train.loop import dataset_mse, fit
from lbdrn_msic_tpu.utils.synth import synth_scene


def timed(label, fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        out = fn()
        leaf = jax.tree.leaves(out)[0]
        float(jnp.asarray(leaf).reshape(-1)[0])
        best = min(best, time.time() - t0)
    print(f"{label:>16}: {best*1e3:9.1f} ms", flush=True)
    return best


def main():
    H = W = 2048
    C, K, g, bs = 4, 5, 8, 8192
    fspec = FeatureSpec()
    mspec = ModelSpec()
    img = synth_scene(H, W, channels=C, effective_bits=12, seed=42)
    dev = jnp.asarray(img)

    from lbdrn_msic_tpu.codec import _prepare_tile

    plane, plane_scale, labels = _prepare_tile(dev, K, fspec.D)
    label_scale = jnp.float32(lsb_scale(K))
    dim_in = fspec.feature_dim(C)
    padded_in = pad_dim(dim_in)

    t_full = {}
    for ve, tag in ((1, "fit_e10_v1"), (10, "fit_e10_v10")):
        tspec = TrainSpec(sample_granule=g, val_every=ve)
        t_full[tag] = timed(
            tag,
            lambda ts=tspec: fit(
                plane, plane_scale, labels, label_scale,
                jax.random.PRNGKey(0), fspec, mspec, ts, H, W, C,
                staging="cached", tap_dtype="float32", use_fused=True,
            ).best_mse,
        )

    t_cache = timed(
        "build_cache",
        lambda: build_feature_cache(
            plane, plane_scale, fspec, H, W, padded_in, g=g
        ),
        n=2,
    )
    x_cache = build_feature_cache(plane, plane_scale, fspec, H, W, padded_in, g=g)
    labels_g = build_granule_labels(labels, H, W, g)
    n = H * W
    n_g = -(-n // g)
    x_cache_g = x_cache.reshape(n_g, g * padded_in)

    params = init_params(jax.random.PRNGKey(1), dim_in, C, mspec,
                         pad_input_to=padded_in)
    zeros = jax.tree.map(jnp.zeros_like, params)

    key = jax.random.PRNGKey(2)
    xb = jax.random.uniform(key, (bs, padded_in), jnp.float32, -1, 1)
    yb = jax.random.uniform(key, (bs, C), jnp.float32)
    maskb = jnp.ones((bs,), jnp.float32)

    @jax.jit
    def steps_fixed(params, m, v):
        def body(carry, i):
            p, m, v = carry
            p, m, v, loss = fused_train_step(
                p, m, v, xb, yb, maskb, jnp.float32(1e-3), i + 1, mspec, C
            )
            return (p, m, v), loss

        (_, _, _), losses = jax.lax.scan(body, (params, m, v), jnp.arange(512))
        return losses.sum()

    timed("steps512_fixed", lambda: steps_fixed(params, zeros, zeros))

    bpg = bs // g

    @jax.jit
    def steps_gather(params, m, v, key, x_cache_g, labels_g):
        perm = jax.random.permutation(key, n_g)[: 512 * bpg].reshape(512, bpg)

        def body(carry, inp):
            p, m, v = carry
            gi, i = inp
            x = x_cache_g[gi].reshape(bs, padded_in)
            pix2d = (gi * g)[:, None] + jnp.arange(g)[None, :]
            mask = (pix2d < n).reshape(-1).astype(jnp.float32)
            y = (labels_g[gi].astype(jnp.float32) * label_scale).reshape(bs, C)
            p, m, v, loss = fused_train_step(
                p, m, v, x, y, mask, jnp.float32(1e-3), i + 1, mspec, C
            )
            return (p, m, v), loss

        (_, _, _), losses = jax.lax.scan(
            body, (params, m, v), (perm, jnp.arange(512))
        )
        return losses.sum()

    timed("steps512_gather",
          lambda: steps_gather(params, zeros, zeros, jax.random.PRNGKey(3),
                               x_cache_g, labels_g))

    block_rows = min(H, max(1, (1 << 17) // max(W, 1)))

    @functools.partial(jax.jit)
    def eval_once(params, x_cache):
        return dataset_mse(
            params, plane, plane_scale, labels, label_scale, fspec, mspec,
            H, W, block_rows, padded_in, x_cache=x_cache,
        )

    timed("eval_once", lambda: eval_once(params, x_cache))

    print(
        f"derived: eval marginal ~ {(t_full['fit_e10_v1'] - t_full['fit_e10_v10']) / 9 * 1e3:.1f} "
        f"ms/eval over 9 extra evals", flush=True,
    )


if __name__ == "__main__":
    main()
