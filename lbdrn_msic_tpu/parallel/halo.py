"""Spatially-sharded decoding with halo exchange over ICI.

The reference decodes strictly serially on one device (reference
decode.py:122-130).  Here the image's row dimension is sharded over the
mesh's "sp" axis; each device reconstructs its row band.  Because a pixel's
features read a (2D+1)^2 neighborhood, each shard needs D rows of *halo*
from its neighbors — exchanged with `jax.lax.ppermute` (ring shifts over
ICI) before local feature building.  Edge shards reflect-pad instead, so
the result is bit-identical to the single-device decoder.

This is the codec's analogue of sequence/context parallelism (SURVEY §2.3):
the pixel grid is the "sequence", the neighborhood is the "context window",
and the halo exchange replaces ring attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from lbdrn_msic_tpu.core.config import FeatureSpec, ModelSpec
from lbdrn_msic_tpu.features.engine import row_block_features
from lbdrn_msic_tpu.models.siren import SirenParams, forward, pad_dim, pad_features


def _shard_body(
    base_shard: jnp.ndarray,
    params: SirenParams,
    fspec: FeatureSpec,
    mspec: ModelSpec,
    K: int,
    H: int,
    W: int,
    scale: jnp.ndarray,
    axis: str,
    n_shards: int,
):
    """Reconstruct one row band. base_shard: (C, H/n, W) uint16 (local)."""
    C, Hl, _ = base_shard.shape
    D = fspec.D
    me = jax.lax.axis_index(axis)

    # halo exchange: D boundary rows from each neighbor over the ring
    up = jax.lax.ppermute(  # my bottom rows -> next shard's top halo
        base_shard[:, Hl - D :, :], axis,
        [(i, (i + 1) % n_shards) for i in range(n_shards)],
    )
    down = jax.lax.ppermute(  # my top rows -> previous shard's bottom halo
        base_shard[:, :D, :], axis,
        [(i, (i - 1) % n_shards) for i in range(n_shards)],
    )
    # edge shards reflect instead (global reflect-pad semantics)
    top_reflect = base_shard[:, 1 : D + 1, :][:, ::-1, :]
    bot_reflect = base_shard[:, Hl - D - 1 : Hl - 1, :][:, ::-1, :]
    top = jnp.where(me == 0, top_reflect, up)
    bot = jnp.where(me == n_shards - 1, bot_reflect, down)

    rows = jnp.concatenate([top, base_shard, bot], axis=1)  # (C, Hl+2D, W)
    plane = jnp.pad(rows, ((0, 0), (0, 0), (D, D)), mode="reflect")
    plane = plane.astype(jnp.uint16)

    # local slice-path reconstruction over the band.  Coordinates must be
    # global: row_block_features takes global H and a global r0 for the
    # coords path; the plane it slices is local, so pass a local r0 and add
    # the global row offset to the coords by building features blockwise.
    dim_in = fspec.feature_dim(C)
    padded_in = pad_dim(dim_in)
    R = min(Hl, 256)
    n_blocks = -(-Hl // R)

    def body(_, b):
        r0 = jnp.minimum(b * R, Hl - R)
        x = row_block_features(plane, scale, r0, fspec, Hl, W, R)
        if fspec.use_coords:
            # rebuild coords with GLOBAL row indices (local ones are wrong)
            from lbdrn_msic_tpu.features.engine import _coord_features

            ii = me * Hl + r0 + jax.lax.broadcasted_iota(jnp.int32, (R, W), 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
            coords = _coord_features(ii, jj, H, W, fspec).reshape(R * W, -1)
            x = jnp.concatenate([coords, x[:, coords.shape[-1] :]], axis=-1)
        pred = forward(params, pad_features(x, padded_in), mspec)
        residual = jnp.round(pred * float(2**K - 1)).reshape(R, W, C).transpose(2, 0, 1)
        blk = jax.lax.dynamic_slice(base_shard, (0, r0, 0), (C, R, W))
        out = jnp.round(
            (blk.astype(jnp.int32) << K).astype(jnp.float32) + residual
        ).astype(jnp.uint16)
        return None, (out, r0)

    _, (blocks, r0s) = jax.lax.scan(body, None, jnp.arange(n_blocks))
    out = jnp.zeros((C, Hl, W), jnp.uint16)

    def place(i, out):
        return jax.lax.dynamic_update_slice(out, blocks[i], (0, r0s[i], 0))

    return jax.lax.fori_loop(0, n_blocks, place, out)


def reconstruct_sp(
    mesh: Mesh,
    base: jnp.ndarray,
    params: SirenParams,
    fspec: FeatureSpec,
    mspec: ModelSpec,
    K: int,
) -> np.ndarray:
    """Row-sharded reconstruction over the mesh's "sp"(=dp) axis.

    base: (C, H, W) uint16 with H divisible by the axis size.  The plane
    max-normalization is global (computed once, broadcast), matching the
    single-device decoder exactly.
    """
    axis = "dp"  # reuse the mesh's dp axis as the spatial axis
    n = mesh.shape[axis]
    C, H, W = base.shape
    if H % n != 0:
        raise ValueError(f"H={H} must divide over {n} shards")
    scale = 1.0 / jnp.maximum(jnp.max(base).astype(jnp.float32), 1.0)

    body = functools.partial(
        _shard_body, fspec=fspec, mspec=mspec, K=K, H=H, W=W,
        axis=axis, n_shards=n,
    )
    fn = jax.shard_map(
        lambda b, p, s: body(b, p, scale=s),
        mesh=mesh,
        in_specs=(P(None, axis, None), P(), P()),
        out_specs=P(None, axis, None),
        check_vma=False,
    )
    return np.asarray(jax.jit(fn)(base, params, scale))
