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


@functools.partial(
    jax.jit, static_argnames=("fspec", "mspec", "H", "W", "band_rows")
)
def _reconstruct_band(
    base: jnp.ndarray,
    params: SirenParams,
    r0: jnp.ndarray,
    fspec: FeatureSpec,
    mspec: ModelSpec,
    K: jnp.ndarray,
    H: int,
    W: int,
    band_rows: int,
) -> jnp.ndarray:
    """One row band [r0, r0+band_rows) of the reconstruction (r0 clamped)."""
    C = base.shape[0]
    K = jnp.asarray(K, jnp.int32)
    plane, scale = pad_plane(base, fspec.D)
    padded_in = pad_dim(fspec.feature_dim(C))
    R = min(256, band_rows)
    n_blocks = -(-band_rows // R)
    lsb_peak = (jnp.int32(1) << K).astype(jnp.float32) - 1.0

    def body(_, b):
        rb = jnp.minimum(r0 + b * R, H - R)
        x = row_block_features(plane, scale, rb, fspec, H, W, R)
        pred = forward(params, pad_features(x, padded_in), mspec)
        residual = jnp.round(pred * lsb_peak).reshape(R, W, C).transpose(2, 0, 1)
        blk = jax.lax.dynamic_slice(base, (0, rb, 0), (C, R, W))
        out = jnp.round(
            (blk.astype(jnp.int32) << K).astype(jnp.float32) + residual
        ).astype(jnp.uint16)
        return None, (out, rb - r0)

    _, (blocks, offs) = jax.lax.scan(body, None, jnp.arange(n_blocks))
    out = jnp.zeros((C, band_rows, W), jnp.uint16)

    def place(i, out):
        return jax.lax.dynamic_update_slice(out, blocks[i], (0, offs[i], 0))

    return jax.lax.fori_loop(0, n_blocks, place, out)


def reconstruct_streamed(
    base: np.ndarray,
    params: SirenParams,
    fspec: FeatureSpec,
    mspec: ModelSpec,
    K: int,
    n_bands: int = 4,
) -> np.ndarray:
    """Reconstruction with device->host streaming: the image is computed in
    row bands, all dispatched asynchronously, so fetching band i overlaps
    the device computing bands i+1.. — hides transfer latency behind
    compute (the single-program path serializes them)."""
    C, H, W = base.shape
    if H < 512:
        n_bands, band_rows = 1, H
    else:
        # uniform bands, multiple of the 256-row block so in-band blocks
        # never spill past a band boundary
        band_rows = -(-(-(-H // n_bands)) // 256) * 256
        n_bands = -(-H // band_rows)
    dev = jnp.asarray(base)
    pend = []
    for b in range(n_bands):
        r0 = min(b * band_rows, H - band_rows)
        pend.append(
            (r0, _reconstruct_band(dev, params, jnp.int32(r0), fspec, mspec,
                                   jnp.int32(K), H, W, band_rows))
        )
    out = np.empty((C, H, W), np.uint16)
    for r0, dev_band in pend:
        out[:, r0 : r0 + band_rows] = np.asarray(dev_band)
    return out
