"""Scale-out over a TPU device mesh.

The reference has **no** distributed layer at all — parallelism there is
"launch more shell processes" (reference run.sh:29-40; SURVEY §2.3).  Here
the two axes of parallelism this codec actually has are first-class:

- **dp** (pixel-batch data parallelism): one tile's overfit loop runs inside
  ``shard_map`` over the "dp" mesh axis; every device trains on its slice of
  each batch, loss terms and gradients are ``psum``-reduced over ICI, and the
  replicated parameters evolve exactly as in the single-device loop.
- **ep** (expert fan-out): independent (K-rate, tile) jobs — the
  embarrassingly-parallel structure the reference exploits with shell-level
  sweeps — are stacked on a leading axis and ``vmap``-ed, with that axis
  sharded over the "ep" mesh axis so each device trains its own network.

Both compose under one jit; multi-host pods extend the same mesh via
``jax.distributed`` (fan-out rides DCN, psum rides ICI).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lbdrn_msic_tpu.core.config import FeatureSpec, ModelSpec, TrainSpec
from lbdrn_msic_tpu.train.loop import FitResult, fit_core


def make_mesh(
    dp: int = 1, ep: int = 1, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if dp * ep > len(devices):
        raise ValueError(f"mesh {ep}x{dp} needs {ep*dp} devices, have {len(devices)}")
    grid = np.asarray(devices[: dp * ep]).reshape(ep, dp)
    return Mesh(grid, ("ep", "dp"))


def fit_dp(
    mesh: Mesh,
    plane: jnp.ndarray,
    plane_scale: jnp.ndarray,
    labels: jnp.ndarray,
    label_scale: jnp.ndarray,
    key: jax.Array,
    fspec: FeatureSpec,
    mspec: ModelSpec,
    tspec: TrainSpec,
    H: int,
    W: int,
    C: int,
    staging: str = "full",
    tap_dtype: str = "int16",
) -> FitResult:
    """Data-parallel fit of ONE tile over the mesh's "dp" axis.

    Inputs are replicated; each device gathers/computes its batch slice and
    gradients meet in a psum.  Outputs are replicated FitResults.
    """
    dp = mesh.shape["dp"]
    body = functools.partial(
        fit_core,
        fspec=fspec, mspec=mspec, tspec=tspec,
        H=H, W=W, C=C, staging=staging, tap_dtype=tap_dtype,
        axis_name="dp", axis_size=dp,
    )
    shardmapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(shardmapped)(plane, plane_scale, labels, label_scale, key)


def fit_experts(
    mesh: Mesh,
    planes: jnp.ndarray,
    plane_scales: jnp.ndarray,
    labels: jnp.ndarray,
    label_scales: jnp.ndarray,
    keys: jax.Array,
    fspec: FeatureSpec,
    mspec: ModelSpec,
    tspec: TrainSpec,
    H: int,
    W: int,
    C: int,
    staging: str = "full",
    tap_dtype: str = "int16",
    hws: jnp.ndarray | None = None,
) -> FitResult:
    """Train E independent same-shaped experts, one per "ep" shard.

    planes: (E, C, H+2D, W+2D); plane_scales: (E,); labels: (E, C, H, W);
    label_scales: (E,); keys: (E,) PRNG keys.  Returns a FitResult whose
    leaves have a leading E axis.  This is the reference's run.sh sweep
    (K-points / tiles) as a single sharded program.

    `hws` ((E, 2) int32): per-expert ACTUAL (height, width) when H/W are
    shape-bucket dims and the planes/labels are bucket-padded — each
    expert masks its own pad (fit_core's traced `hw`), so images of
    different shapes in one bucket fan out over the mesh together.
    """
    shard = NamedSharding(mesh, P("ep"))
    vfit = _expert_vfit(
        fspec, mspec, tspec, H, W, C, staging, tap_dtype, hws is not None
    )
    args = (planes, plane_scales, labels, label_scales, keys) + (
        (hws,) if hws is not None else ()
    )
    return vfit(*[jax.device_put(a, shard) for a in args])


@functools.lru_cache(maxsize=None)
def _expert_vfit(fspec, mspec, tspec, H, W, C, staging, tap_dtype, with_hws):
    """Cached jitted vmap of fit_core over the expert axis — one traced
    program per (specs, bucket shape, staging, hws?) signature, so
    repeated mesh fan-outs reuse the compile instead of re-tracing a
    fresh jit wrapper per call."""
    body = functools.partial(
        fit_core, fspec=fspec, mspec=mspec, tspec=tspec, H=H, W=W, C=C,
        staging=staging, tap_dtype=tap_dtype,
    )
    if with_hws:
        return jax.jit(jax.vmap(
            lambda p, s, l, ls, k, hw: body(p, s, l, ls, k, hw=hw),
            in_axes=(0, 0, 0, 0, 0, 0),
        ))
    return jax.jit(jax.vmap(body, in_axes=(0, 0, 0, 0, 0)))
