"""Device-side reconstruction: replay the network over the decoded base layer.

Mirrors the reference decoder's math (reference decode.py:77-139): rebuild
the exact feature tensor from the decoded base plane, run the MLP, then
``residual = round(pred * (2^K - 1))`` and ``image = (base << K) + residual``
in uint16.  Instead of the reference's flat 2^22-row chunking (a CUDA OOM
guard, decode.py:127), the image is processed as contiguous row blocks via
the slice-path feature builder — no gathers, fully fused by XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lbdrn_msic_tpu.core.config import FeatureSpec, ModelSpec
from lbdrn_msic_tpu.features.engine import pad_plane, row_block_features
from lbdrn_msic_tpu.models.siren import (
    SirenParams,
    forward,
    pad_dim,
    pad_features,
)


@functools.partial(
    jax.jit, static_argnames=("fspec", "mspec", "H", "W", "block_rows")
)
def reconstruct(
    base: jnp.ndarray,
    params: SirenParams,
    fspec: FeatureSpec,
    mspec: ModelSpec,
    K: jnp.ndarray,
    H: int,
    W: int,
    block_rows: int = 256,
) -> jnp.ndarray:
    """base: (C, H, W) uint16 decoded base layer -> (C, H, W) uint16 image.

    K is a traced scalar so one compiled program serves every rate point of
    an RD sweep (shapes don't depend on it).
    """
    C = base.shape[0]
    K = jnp.asarray(K, jnp.int32)
    plane, scale = pad_plane(base, fspec.D)
    dim_in = fspec.feature_dim(C)
    padded_in = pad_dim(dim_in)
    R = min(block_rows, H)
    n_blocks = -(-H // R)
    lsb_peak = (jnp.int32(1) << K).astype(jnp.float32) - 1.0

    def body(_, b):
        r0 = jnp.minimum(b * R, H - R)
        x = row_block_features(plane, scale, r0, fspec, H, W, R)
        pred = forward(params, pad_features(x, padded_in), mspec)
        residual = jnp.round(pred * lsb_peak)  # (R*W, C)
        residual = residual.reshape(R, W, C).transpose(2, 0, 1)
        base_blk = jax.lax.dynamic_slice(base, (0, r0, 0), (C, R, W))
        shifted = (base_blk.astype(jnp.int32) << K).astype(jnp.float32)
        block = jnp.round(shifted + residual).astype(jnp.uint16)
        return None, (block, r0)

    _, (blocks, r0s) = jax.lax.scan(body, None, jnp.arange(n_blocks))

    out = jnp.zeros((C, H, W), jnp.uint16)

    def place(i, out):
        return jax.lax.dynamic_update_slice(out, blocks[i], (0, r0s[i], 0))

    return jax.lax.fori_loop(0, n_blocks, place, out)


def reconstruct_np(base: np.ndarray, params, fspec, mspec, K: int) -> np.ndarray:
    _, H, W = base.shape
    return np.asarray(
        reconstruct(jnp.asarray(base), params, fspec, mspec, K, H, W)
    )
