"""On-device feature/label engine.

Semantics match the reference pipeline (reference LBDRNdataset.py:92-133 /
decode.py:77-102) but the design is TPU-first: instead of materializing the
full (H*W, feature_dim) float tensor on the host (19+ GB for a Gaofen scene),
the padded normalized base plane lives in HBM and per-pixel feature vectors
are built on the fly —

- **gather path** (training): random pixel batches gather their (2D+1)^2
  neighborhoods from the flattened plane with one fused XLA gather,
- **slice path** (eval / decode): contiguous row blocks build neighborhoods
  as stacked shifted slices, which XLA fuses into pure vector ops (no gather
  hardware cost).

Feature vector layout per pixel (identical to the reference's
``sliding_window_view`` ordering, LBDRNdataset.py:119-129):
``[coords?] ++ [band0: (2D+1)^2 taps row-major, band1: ..., ...]`` with taps
optionally center-subtracted (RELATIVE) and the plane max-normalized.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lbdrn_msic_tpu.core.config import FeatureSpec


def split_msb_lsb(img: jnp.ndarray, K: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MSB/LSB split (reference LBDRNdataset.py:94-97).

    img: (C, H, W) uint16.  Returns (MSB uint16 (C,H,W),
    LSB float32 (C,H,W) normalized by 2^K - 1).
    """
    img = img.astype(jnp.uint16)
    msb = img >> K
    lsb = (img - (msb << K)).astype(jnp.float32) / float(2**K - 1)
    return msb, lsb


def pad_plane(msb: jnp.ndarray, D: int) -> jnp.ndarray:
    """Reflect-pad the max-normalized base plane (reference
    LBDRNdataset.py:119-123).

    msb: (C, H, W) integer base layer.  Returns float32
    (C, H + 2D, W + 2D).  The max is global over all bands; a zero plane
    normalizes by 1 instead of producing NaNs.
    """
    scale = jnp.maximum(msb.max().astype(jnp.float32), 1.0)
    plane = msb.astype(jnp.float32) / scale
    if D > 0:
        plane = jnp.pad(plane, ((0, 0), (D, D), (D, D)), mode="reflect")
    return plane


def _coord_features(ii: jnp.ndarray, jj: jnp.ndarray, H: int, W: int, spec: FeatureSpec):
    """Normalized coords in [-1,1] + optional sin/cos embedding
    (reference LBDRNdataset.py:108-117).

    ii, jj: int arrays of any (same) shape; returns (..., num_coord_features).
    Per-axis layout with embedding: [p, sin(sigma^k*pi*p)_k, cos(...)_k].
    """
    ph = 2.0 * ii.astype(jnp.float32) / (H - 1) - 1.0
    pw = 2.0 * jj.astype(jnp.float32) / (W - 1) - 1.0
    coords = jnp.stack([ph, pw], axis=-1)  # (..., 2)
    if not spec.embedding:
        return coords
    freqs = (spec.sigma ** np.arange(spec.n_freq)).astype(np.float32) * np.pi
    scaled = coords[..., None] * freqs  # (..., 2, n_freq)
    parts = jnp.concatenate(
        [coords[..., None], jnp.sin(scaled), jnp.cos(scaled)], axis=-1
    )  # (..., 2, 1 + 2*n_freq)
    return parts.reshape(*coords.shape[:-1], -1)


@functools.partial(jax.jit, static_argnames=("spec", "H", "W"))
def gather_features(
    plane: jnp.ndarray,
    pixel_idx: jnp.ndarray,
    spec: FeatureSpec,
    H: int,
    W: int,
) -> jnp.ndarray:
    """Build feature vectors for a batch of flat pixel indices.

    plane: (C, H+2D, W+2D) float32 padded normalized base plane.
    pixel_idx: (B,) int32 flat indices into the H*W pixel grid (callers mask
    out-of-range sentinels themselves; indices are clipped here).
    Returns (B, feature_dim) float32.
    """
    C = plane.shape[0]
    D = spec.D
    Wp = W + 2 * D
    idx = jnp.clip(pixel_idx, 0, H * W - 1)
    ii = idx // W
    jj = idx % W

    feats = []
    if spec.use_coords:
        feats.append(_coord_features(ii, jj, H, W, spec))
    if spec.use_colors:
        side = 2 * D + 1
        base = ii * Wp + jj  # top-left corner of the window in padded coords
        offs = (np.arange(side)[:, None] * Wp + np.arange(side)[None, :]).reshape(-1)
        offs = jnp.asarray(offs, dtype=idx.dtype)
        win_idx = base[:, None] + offs[None, :]  # (B, side^2)
        flat = plane.reshape(C, -1)
        taps = flat[:, win_idx.reshape(-1)].reshape(C, -1, side * side)
        taps = jnp.transpose(taps, (1, 0, 2))  # (B, C, side^2)
        if spec.relative and D > 0:
            center = taps[:, :, (side * side) // 2][:, :, None]
            taps = taps - center
        feats.append(taps.reshape(taps.shape[0], -1))
    return jnp.concatenate(feats, axis=-1) if len(feats) > 1 else feats[0]


@functools.partial(jax.jit, static_argnames=("spec", "H", "W", "block_rows"))
def row_block_features(
    plane: jnp.ndarray,
    r0: jnp.ndarray,
    spec: FeatureSpec,
    H: int,
    W: int,
    block_rows: int,
) -> jnp.ndarray:
    """Feature vectors for `block_rows` contiguous rows starting at row r0.

    Pure-slice construction (no gather): for each window offset (di, dj) take
    plane[:, r0+di : r0+di+R, dj : dj+W].  r0 may be traced (dynamic_slice);
    rows beyond H-block_rows must be handled by the caller via clamping.
    Returns (block_rows * W, feature_dim) float32, row-major.
    """
    C = plane.shape[0]
    D = spec.D
    R = block_rows
    feats = []
    if spec.use_coords:
        ii = r0 + jax.lax.broadcasted_iota(jnp.int32, (R, W), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
        feats.append(_coord_features(ii, jj, H, W, spec).reshape(R * W, -1))
    if spec.use_colors:
        side = 2 * D + 1
        block = jax.lax.dynamic_slice(
            plane, (0, r0, 0), (C, R + 2 * D, W + 2 * D)
        )  # (C, R+2D, W+2D)
        taps = jnp.stack(
            [
                jax.lax.dynamic_slice(block, (0, di, dj), (C, R, W))
                for di in range(side)
                for dj in range(side)
            ],
            axis=1,
        )  # (C, side^2, R, W)
        if spec.relative and D > 0:
            center = taps[:, (side * side) // 2][:, None]
            taps = taps - center
        taps = jnp.transpose(taps, (2, 3, 0, 1)).reshape(R * W, -1)
        feats.append(taps)
    return jnp.concatenate(feats, axis=-1) if len(feats) > 1 else feats[0]


def gather_labels(lsb: jnp.ndarray, pixel_idx: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel LSB label vectors: (B, C) from (C, H, W) normalized LSB."""
    C = lsb.shape[0]
    flat = lsb.reshape(C, -1)
    idx = jnp.clip(pixel_idx, 0, flat.shape[1] - 1)
    return jnp.transpose(flat[:, idx], (1, 0))
