"""The per-image overfit loop, fully on device.

Where the reference runs a Python/ignite loop with a host DataLoader feeding
tiny CUDA batches (reference encode.py:67-157, modified_ignite_engine.py:18-27
— the dominant cost there is per-batch host overhead, SURVEY §3.1), here the
*entire* training run — per-epoch pixel permutation, feature staging/gather,
forward, backward, Adam, StepLR, periodic full-image MSE eval, best-params
tracking — is one jitted program: ``lax.scan`` over epochs, ``lax.scan``
over steps, ``lax.cond`` for the eval cadence.  Zero host round trips until
the final weights come back.

Two batch-construction modes (see features/engine.py):
- **staged** (default): integer taps materialized once, each step is one
  vectorized row gather — the TPU-fast path,
- **gather**: scalar-gather fallback for tiles whose tap matrix would not
  fit in the staging budget.

Faithful semantics (for RD parity with the reference at matched settings):
- per-epoch shuffle = fresh random permutation of all H*W pixels; the last
  partial batch is kept and masked (DataLoader drop_last=False),
- loss = MSE over the batch (reference LBDRNloss.py:4-11),
- Adam(lr) with torch defaults + StepLR(step_size=max(1, epochs//3),
  gamma=0.1) stepped at epoch end (reference encode.py:84-85),
- every ``val_every`` epochs, full-dataset MSE decides a strict-improvement
  best-params checkpoint (reference encode.py:96-117); with epochs == 1 the
  final weights are taken directly (reference encode.py:100-103).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import optax

from lbdrn_msic_tpu.core.config import FeatureSpec, ModelSpec, TrainSpec
from lbdrn_msic_tpu.features.engine import (
    _coord_features,
    build_tap_matrix,
    gather_features,
    gather_labels,
    row_block_features,
    staged_features,
)
from lbdrn_msic_tpu.models.siren import (
    SirenParams,
    forward,
    init_params,
    pad_dim,
    pad_features,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FitResult:
    params: SirenParams  # best-MSE params (the bitstream payload)
    best_mse: jnp.ndarray
    best_epoch: jnp.ndarray  # 1-indexed, -1 if never evaluated
    final_params: SirenParams
    epoch_losses: jnp.ndarray  # (epochs,) mean train loss per epoch
    step_losses: jnp.ndarray  # (epochs, steps_per_epoch) per-iteration loss


def make_lr_schedule(tspec: TrainSpec, steps_per_epoch: int):
    step_size = tspec.lr_step_size()

    def schedule(step):
        epoch = step // steps_per_epoch
        return tspec.lr * (tspec.lr_gamma ** (epoch // step_size))

    return schedule


def dataset_mse(
    params: SirenParams,
    plane: jnp.ndarray,
    plane_scale: jnp.ndarray,
    labels: jnp.ndarray,
    label_scale: jnp.ndarray,
    fspec: FeatureSpec,
    mspec: ModelSpec,
    H: int,
    W: int,
    block_rows: int,
    padded_in: int,
    axis_name: str | None = None,
    axis_size: int = 1,
) -> jnp.ndarray:
    """Full-image MSE via the slice path (one scan over row blocks).

    Under data parallelism (`axis_name` set, called inside shard_map) the
    row blocks are round-robined over the axis and the SSE is psum-reduced.
    """
    C = labels.shape[-1]
    R = block_rows
    n_blocks = -(-H // R)
    me = jax.lax.axis_index(axis_name) if axis_name else 0
    n_outer = -(-n_blocks // axis_size)

    def body(acc, i):
        b = i * axis_size + me
        b_safe = jnp.minimum(b, n_blocks - 1)
        r0 = jnp.minimum(b_safe * R, H - R)
        x = row_block_features(plane, plane_scale, r0, fspec, H, W, R)
        pred = forward(params, pad_features(x, padded_in), mspec)
        rows = r0 + jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
        valid = (rows >= b_safe * R) & (rows < H)  # skip rows a clamped r0 re-reads
        mask = jnp.broadcast_to(valid, (R, W)).reshape(-1)
        y = jax.lax.dynamic_slice(labels, (r0 * W, 0), (R * W, C))
        y = y.astype(jnp.float32) * label_scale
        sse = (((pred - y) ** 2) * mask[:, None]).sum()
        sse = jnp.where(b < n_blocks, sse, 0.0)
        return acc + sse, None

    sse, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n_outer))
    if axis_name:
        sse = jax.lax.psum(sse, axis_name)
    return sse / (H * W * C)


def fit_core(
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
    staged: bool = True,
    tap_dtype: str = "int16",
    axis_name: str | None = None,
    axis_size: int = 1,
    use_fused: bool = False,
) -> FitResult:
    """Overfit one network to one image tile; everything on device.

    plane: (C, H+2D, W+2D) uint16 padded base plane; plane_scale: 1/max.
    labels: (H*W, C) uint16 LSB matrix; label_scale: 1/(2^K-1).

    With `axis_name`/`axis_size` set this body runs inside shard_map over a
    data-parallel mesh axis: each device trains on its 1/axis_size slice of
    every batch, loss terms and gradients are psum-reduced, so parameters
    stay replicated (reference semantics, just sharded over ICI).

    `use_fused` switches the step to the single-Pallas-kernel fused
    forward/backward/Adam path (ops/fused_step.py) — single-device only
    (DP needs the psum between grads and Adam) and requires the batch to be
    a multiple of its tile size.
    """
    dim_in = fspec.feature_dim(C)
    padded_in = pad_dim(dim_in)
    n = H * W
    bs = min(tspec.batch_size, n)
    if axis_size > 1:
        bs = max(axis_size, bs - bs % axis_size)  # keep shards equal-sized
    # sampling granule: shuffle g-pixel runs instead of single pixels
    # (g=1 == reference semantics); see TrainSpec.sample_granule
    g = tspec.sample_granule if (staged and fspec.use_colors) else 1
    if g > 1 and (bs % g or bs // axis_size % g):
        g = 1
    n_g = -(-n // g)  # granule count
    n_rows = n_g * g
    bs_local = bs // axis_size
    bpg_local = bs_local // g  # granules per local batch
    steps_per_epoch = -(-n_g // (bs // g))
    pad_n_g = steps_per_epoch * (bs // g)
    block_rows = min(H, max(1, (1 << 17) // max(W, 1)))
    me = jax.lax.axis_index(axis_name) if axis_name else 0

    taps = (
        build_tap_matrix(
            plane, fspec, H, W, jnp.dtype(tap_dtype), pad_rows_to=n_rows
        )
        if (staged and fspec.use_colors)
        else None
    )
    if g > 1:
        n_colors = fspec.num_color_features(C)
        taps_g = taps.reshape(n_g, g * n_colors)
        labels_pad = jnp.pad(labels, ((0, n_rows - n), (0, 0))) if n_rows > n else labels
        labels_g = labels_pad.reshape(n_g, g * C)

    if use_fused:
        from lbdrn_msic_tpu.ops.fused_step import TILE as FUSED_TILE

        if axis_name is not None or bs_local % FUSED_TILE != 0:
            use_fused = False

    key, init_key = jax.random.split(key)
    params = init_params(init_key, dim_in, C, mspec, pad_input_to=padded_in)

    schedule = make_lr_schedule(tspec, steps_per_epoch)
    if use_fused:
        zeros = jax.tree.map(jnp.zeros_like, params)
        opt_state = (zeros, zeros, jnp.int32(0))  # (m, v, step count)
    else:
        opt = optax.adam(schedule)
        opt_state = opt.init(params)

    def batch_features(idx):
        if taps is not None:
            return staged_features(taps, plane_scale, idx, fspec, H, W)
        return gather_features(plane, plane_scale, idx, fspec, H, W)

    def make_batch(gidx):
        """granule ids (bpg_local,) -> (x, y, mask) for the local batch."""
        if g == 1:
            mask = (gidx < n).astype(jnp.float32)
            idx = jnp.clip(gidx, 0, n - 1)
            x = pad_features(batch_features(idx), padded_in)
            y = gather_labels(labels, label_scale, idx)
            return x, y, mask
        gvalid = gidx < n_g
        gi = jnp.clip(gidx, 0, n_g - 1)
        pix2d = (gi * g)[:, None] + jnp.arange(g)[None, :]
        mask = (gvalid[:, None] & (pix2d < n)).reshape(-1).astype(jnp.float32)
        colors = (
            taps_g[gi].astype(jnp.float32) * plane_scale
        ).reshape(bs_local, -1)
        if fspec.use_coords:
            from lbdrn_msic_tpu.features.engine import _coord_features

            pix = pix2d.reshape(-1)
            coords = _coord_features(pix // W, pix % W, H, W, fspec)
            colors = jnp.concatenate([coords, colors], axis=-1)
        x = pad_features(colors, padded_in)
        y = (labels_g[gi].astype(jnp.float32) * label_scale).reshape(bs_local, C)
        return x, y, mask

    def train_step(carry, step_perm):
        params, opt_state = carry
        gidx = jax.lax.dynamic_slice(step_perm, (me * bpg_local,), (bpg_local,))

        if use_fused:
            from lbdrn_msic_tpu.ops.fused_step import fused_train_step

            m_state, v_state, count = opt_state
            x, y, mask = make_batch(gidx)
            params, m_state, v_state, loss = fused_train_step(
                params, m_state, v_state, x, y, mask,
                schedule(count), count + 1, mspec, C,
            )
            return (params, (m_state, v_state, count + 1)), loss

        def loss_fn(p):
            x, y, mask = make_batch(gidx)
            pred = forward(p, x, mspec)
            se = ((pred - y) ** 2 * mask[:, None]).sum()
            cnt = mask.sum() * C
            if axis_name:
                se = jax.lax.psum(se, axis_name)
                cnt = jax.lax.psum(cnt, axis_name)
            return se / cnt

        loss, grads = jax.value_and_grad(loss_fn)(params)
        if axis_name:
            grads = jax.lax.psum(grads, axis_name)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    def epoch_body(carry, epoch_idx):
        params, opt_state, best_params, best_mse, best_epoch, key = carry
        key, pk = jax.random.split(key)
        perm = jax.random.permutation(pk, n_g)
        perm = jnp.concatenate(
            [perm, jnp.full((pad_n_g - n_g,), n_g, dtype=perm.dtype)]
        ).reshape(steps_per_epoch, bs // g)
        (params, opt_state), losses = jax.lax.scan(
            train_step, (params, opt_state), perm
        )

        if tspec.epochs == 1:
            best_params, best_mse = params, losses.mean()
            best_epoch = jnp.int32(1)
        else:
            def run_eval(args):
                params, best_params, best_mse, best_epoch = args
                mse = dataset_mse(
                    params, plane, plane_scale, labels, label_scale,
                    fspec, mspec, H, W, block_rows, padded_in,
                    axis_name, axis_size,
                )
                better = mse < best_mse
                new_best = jax.tree.map(
                    lambda new, old: jnp.where(better, new, old),
                    params,
                    best_params,
                )
                return (
                    new_best,
                    jnp.where(better, mse, best_mse),
                    jnp.where(better, epoch_idx + 1, best_epoch),
                )

            def skip_eval(args):
                _, best_params, best_mse, best_epoch = args
                return best_params, best_mse, best_epoch

            do_eval = (epoch_idx + 1) % min(tspec.val_every, tspec.epochs) == 0
            best_params, best_mse, best_epoch = jax.lax.cond(
                do_eval, run_eval, skip_eval,
                (params, best_params, best_mse, best_epoch),
            )
        return (
            (params, opt_state, best_params, best_mse, best_epoch, key),
            (losses.mean(), losses),
        )

    best0 = jax.tree.map(jnp.zeros_like, params)
    carry0 = (params, opt_state, best0, jnp.float32(1e6), jnp.int32(-1), key)
    carry, (epoch_losses, step_losses) = jax.lax.scan(
        epoch_body, carry0, jnp.arange(tspec.epochs)
    )
    params, _, best_params, best_mse, best_epoch, _ = carry
    return FitResult(
        params=best_params,
        best_mse=best_mse,
        best_epoch=best_epoch,
        final_params=params,
        epoch_losses=epoch_losses,
        step_losses=step_losses,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "fspec", "mspec", "tspec", "H", "W", "C", "staged", "tap_dtype", "use_fused"
    ),
)
def fit(
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
    staged: bool = True,
    tap_dtype: str = "int16",
    use_fused: bool = False,
) -> FitResult:
    """Single-device fit (see fit_core)."""
    return fit_core(
        plane, plane_scale, labels, label_scale, key,
        fspec, mspec, tspec, H, W, C, staged, tap_dtype,
        use_fused=use_fused,
    )
