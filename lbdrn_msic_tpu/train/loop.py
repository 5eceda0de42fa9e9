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
    banded_geometry,
    LABEL_STORE_G,
    banded_window_features,
    build_banded_labels,
    build_granule_labels,
    build_row_taps,
    build_tap_matrix,
    gather_features,
    gather_pixel_labels,
    lsb_scale,
    pad_plane,
    row_block_features,
    split_msb_lsb,
    staged_features,
)
from lbdrn_msic_tpu.models.siren import (
    SirenParams,
    forward,
    forward_experts,
    init_params,
    pad_dim,
    pad_features,
)


# scenes above this pixel count use the unrolled per-expert eval in
# fit_rate_experts (the batched eval faults the TPU worker at
# Gaofen-bucket shapes with distinct experts — see
# dataset_mse_experts_unrolled)
EVAL_UNROLL_PX = 1 << 24


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
    if tspec.schedule == "cosine":
        total = max(1, tspec.epochs * steps_per_epoch)

        def schedule(step):
            return tspec.lr * 0.5 * (1.0 + jnp.cos(jnp.pi * step / total))

        return schedule

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
    x_cache: jnp.ndarray | None = None,
    fast_act: bool = False,
    tap_cache: jnp.ndarray | None = None,
    tap_g: int = 1,
    hw: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Full-image MSE via the slice path (one scan over row blocks).

    `hw`: optional traced (2,) int32 actual (height, width) for
    shape-bucketed fits — H/W are then the BUCKET dims and pixels at
    row >= hw[0] or col >= hw[1] are masked out of the SSE, which is
    normalized by the actual pixel count (see fit_core's `hw`).

    `labels` is the (C, H, W) integer LSB plane (2-D (H*W, C) matrices are
    catastrophically lane-padded as program inputs on TPU — see
    features/engine.py::build_banded_labels).

    `x_cache`: optional precomputed (>= H*W, padded_in) f32 feature matrix
    (engine.build_feature_cache) — evals become contiguous slices + matmuls
    instead of rebuilding features from the plane each time.  Bit-identical.

    `tap_cache`: optional granule-grouped integer tap matrix
    (engine.build_tap_matrix, the "full" staging buffer) — evals become
    contiguous slices + the same convert/scale the training gather applies.
    Bit-identical to the slice path (colors-only feature sets; requires
    W % tap_g == 0 so row blocks align to granules).  ~10x cheaper than
    rebuilding features from the plane (92 -> ~9 ms/eval at 4096^2x4).

    Under data parallelism (`axis_name` set, called inside shard_map) the
    row blocks are round-robined over the axis and the SSE is psum-reduced.
    """
    C = labels.shape[0]
    R = block_rows
    n_blocks = -(-H // R)
    me = jax.lax.axis_index(axis_name) if axis_name else 0
    n_outer = -(-n_blocks // axis_size)

    def body(acc, i):
        b = i * axis_size + me
        b_safe = jnp.minimum(b, n_blocks - 1)
        r0 = jnp.minimum(b_safe * R, H - R)
        if x_cache is not None:
            x = jax.lax.dynamic_slice(x_cache, (r0 * W, 0), (R * W, padded_in))
        elif tap_cache is not None:
            tb = jax.lax.dynamic_slice(
                tap_cache, (r0 * W // tap_g, 0),
                (R * W // tap_g, tap_cache.shape[1]),
            )
            x = pad_features(
                tb.astype(jnp.float32).reshape(R * W, -1) * plane_scale,
                padded_in,
            )
        else:
            x = pad_features(
                row_block_features(plane, plane_scale, r0, fspec, H, W, R),
                padded_in,
            )
        pred = forward(params, x, mspec, fast_act=fast_act)
        rows = r0 + jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
        valid = (rows >= b_safe * R) & (rows < H)  # skip rows a clamped r0 re-reads
        if hw is not None:
            valid = valid & (rows < hw[0])
            cols = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
            mask = (valid & (cols < hw[1])).reshape(-1)
        else:
            mask = jnp.broadcast_to(valid, (R, W)).reshape(-1)
        yb = jax.lax.dynamic_slice(labels, (0, r0, 0), (C, R, W))
        y = jnp.transpose(yb.reshape(C, R * W), (1, 0))
        y = y.astype(jnp.float32) * label_scale
        sse = (((pred - y) ** 2) * mask[:, None]).sum()
        sse = jnp.where(b < n_blocks, sse, 0.0)
        return acc + sse, None

    sse, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n_outer))
    if axis_name:
        sse = jax.lax.psum(sse, axis_name)
    if hw is not None:
        return sse / (
            hw[0].astype(jnp.float32) * hw[1].astype(jnp.float32) * C
        )
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
    staging: str = "full",
    tap_dtype: str = "int16",
    axis_name: str | None = None,
    axis_size: int = 1,
    use_fused: bool = False,
    multi_k: int | None = None,
    mm_dtype: str | None = None,
    hw: jnp.ndarray | None = None,
) -> FitResult:
    """Overfit one network to one image tile; everything on device.

    `hw`: optional traced (2,) int32 ACTUAL (height, width) for
    shape-bucketed fits — H/W are then canonical bucket dims (the static
    shapes every device program compiles for) and the inputs are padded
    up to them; pixels at row >= hw[0] or col >= hw[1] are masked out of
    every batch and eval exactly like the existing partial-batch padding,
    so a heterogeneous dataset reuses O(buckets) compiled programs
    instead of O(shapes) (VERDICT r3 #1).  The epoch permutation runs
    over the bucket grid (each real pixel still visited exactly once per
    epoch, uniformly shuffled; batches carry a masked fraction), which
    makes bucketed fits RD-equivalent — not byte-identical — to
    exact-shape fits.

    plane: (C, H+2D, W+2D) uint16 padded base plane; plane_scale: 1/max.
    labels: (C, H, W) uint16 raw LSB plane; label_scale: 1/(2^K-1).
    (The (H*W, C) matrix forms are built fused inside this program — as a
    program input a C-wide matrix is lane-padded up to 16x on TPU.)

    `staging` selects how training batches are built (features/engine.py):
    - "full": the (2D+1)^2 tap matrix (25x image bytes, one row gather/step),
    - "banded": per-row horizontal taps (5x image bytes, `side` contiguous
      row gathers/step) — the fast path for full-size Gaofen scenes whose
      full tap matrix exceeds the staging budget; `tap_dtype` is the RAW
      plane dtype (uint8/uint16) here,
    - "gather": scalar-gather fallback (no staging; also the coords-only
      path).

    With `axis_name`/`axis_size` set this body runs inside shard_map over a
    data-parallel mesh axis: each device trains on its 1/axis_size slice of
    every batch, loss terms and gradients are psum-reduced, so parameters
    stay replicated (reference semantics, just sharded over ICI).

    `use_fused` switches the step to the single-Pallas-kernel fused
    forward/backward/Adam path (ops/fused_step.py) — single-device only
    (DP needs the psum between grads and Adam) and requires the batch to be
    a multiple of its tile size.
    """
    if staging not in ("cached", "full", "banded", "gather"):
        raise ValueError(f"unknown staging mode {staging!r}")
    if staging in ("full", "banded") and not fspec.use_colors:
        staging = "gather"  # coords-only features have no taps to stage
        # ("cached" still applies: the cache holds the final model inputs)
    dim_in = fspec.feature_dim(C)
    padded_in = pad_dim(dim_in)
    n = H * W
    bs = min(tspec.batch_size, n)
    if axis_size > 1:
        bs = max(axis_size, bs - bs % axis_size)  # keep shards equal-sized
    # sampling granule: shuffle g-pixel runs instead of single pixels
    # (g=1 == reference semantics); see TrainSpec.sample_granule
    g = tspec.sample_granule if staging != "gather" else 1
    if g > 1 and (bs % g or bs // axis_size % g):
        g = 1
    side = 2 * fspec.D + 1
    n_colors = fspec.num_color_features(C)
    if staging == "banded":
        # granule grid is W-padded: granules never cross a row boundary
        Wg, ng_row = banded_geometry(W, g)
        n_g = H * ng_row
    else:
        ng_row = 0
        n_g = -(-n // g)  # granule count (flat runs; may cross rows)
    bs_local = bs // axis_size
    bpg_local = bs_local // g  # granules per local batch
    steps_per_epoch = -(-n_g // (bs // g))
    pad_n_g = steps_per_epoch * (bs // g)
    block_rows = min(H, max(1, (1 << 17) // max(W, 1)))
    me = jax.lax.axis_index(axis_name) if axis_name else 0

    taps = row_taps = label_store = x_cache = None
    if staging == "cached":
        from lbdrn_msic_tpu.features.engine import build_feature_cache

        x_cache = build_feature_cache(
            plane, plane_scale, fspec, H, W, padded_in, g=g
        )
        if g > 1:
            # granule-grouped view for 4KB-row batch gathers (same bytes,
            # row-major; hoisted so the step body is gather-only)
            x_cache_g = x_cache.reshape(n_g, g * padded_in)
            labels_g = build_granule_labels(labels, H, W, g)
    elif staging == "full":
        taps = build_tap_matrix(plane, fspec, H, W, jnp.dtype(tap_dtype), g=g)
        if g > 1:
            labels_g = build_granule_labels(labels, H, W, g)
    elif staging == "banded":
        row_taps = build_row_taps(plane, fspec, H, W, g, jnp.dtype(tap_dtype))
        if g > 1:
            labels_g = build_banded_labels(labels, H, W, g)
    if g == 1:
        # g=1 (any staging; the banded grid == the flat grid then): labels
        # live in an 8-pixel-granule store, gathered per pixel with a
        # masked-sum select — a directly-gatherable (n, C) matrix would be
        # lane-padded 128/C-fold on TPU
        label_store = build_granule_labels(labels, H, W, LABEL_STORE_G)

    tile = 0
    if use_fused:
        from lbdrn_msic_tpu.ops.fused_step import pick_tile

        tile = pick_tile(bs_local, padded_in, C, mspec)
        if axis_name is not None or not tile:
            use_fused = False

    # multi-step chunking: k steps per pallas_call, available whenever the
    # whole batch fits one VMEM tile; `multi_k` opts in (None/0 disables).
    # Measured on v5e (scripts/profiling/multik_ab.py, bench config): the
    # per-step path wins — 660 ms vs 790/804/890 ms at k=4/16/64 — so the
    # default stays 0; the chunked kernel remains for shapes where call
    # overhead dominates harder (tiny batches / many tiny epochs).  The
    # chunk is capped so the staged (k, bs, padded_in) batch buffer stays
    # under ~512 MB (same guard as fit_rate_experts).
    if use_fused and multi_k and tile == bs_local:
        cap = max(1, (512 << 20) // (bs_local * padded_in * 4))
        multi_k = min(multi_k, cap, steps_per_epoch)
        if multi_k < 2:
            multi_k = 0
    else:
        multi_k = 0

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

    def in_image(pix):
        """Bucketed fits: flat bucket-grid pixel ids -> in-actual-image."""
        return (pix // W < hw[0]) & (pix % W < hw[1])

    def make_batch(gidx):
        """granule ids (bpg_local,) -> (x, y, mask) for the local batch."""
        if staging == "cached":
            # ONE row gather of final padded f32 inputs — no per-step
            # convert/scale/concat/pad (coords live in the cache too)
            gvalid = gidx < n_g
            gi = jnp.clip(gidx, 0, n_g - 1)
            if g == 1:
                if hw is not None:
                    gvalid = gvalid & in_image(gi)
                mask = gvalid.astype(jnp.float32)
                x = x_cache[gi]
                y = gather_pixel_labels(label_store, gi, C)
                y = y.astype(jnp.float32) * label_scale
                return x, y, mask
            pix2d = (gi * g)[:, None] + jnp.arange(g)[None, :]
            valid2d = gvalid[:, None] & (pix2d < n)
            if hw is not None:
                valid2d = valid2d & in_image(pix2d)
            mask = valid2d.reshape(-1).astype(jnp.float32)
            x = x_cache_g[gi].reshape(bs_local, padded_in)
            y = (labels_g[gi].astype(jnp.float32) * label_scale).reshape(bs_local, C)
            return x, y, mask
        if staging == "banded":
            gvalid = gidx < n_g
            gi = jnp.clip(gidx, 0, n_g - 1)
            jj = (gi % ng_row * g)[:, None] + jnp.arange(g)[None, :]
            valid2d = gvalid[:, None] & (jj < W)
            if hw is not None:
                valid2d = valid2d & (jj < hw[1]) & (
                    (gi // ng_row)[:, None] < hw[0]
                )
            mask = valid2d.reshape(-1).astype(jnp.float32)
            x = pad_features(
                banded_window_features(
                    row_taps, plane_scale, gi, fspec, H, W, g
                ),
                padded_in,
            )
            if g == 1:
                y = gather_pixel_labels(label_store, gi, C)
                y = y.astype(jnp.float32) * label_scale
            else:
                y = (labels_g[gi].astype(jnp.float32) * label_scale).reshape(
                    bs_local, C
                )
            return x, y, mask
        if g == 1:
            valid = gidx < n
            idx = jnp.clip(gidx, 0, n - 1)
            if hw is not None:
                valid = valid & in_image(idx)
            mask = valid.astype(jnp.float32)
            x = pad_features(batch_features(idx), padded_in)
            y = gather_pixel_labels(label_store, idx, C)
            y = y.astype(jnp.float32) * label_scale
            return x, y, mask
        gvalid = gidx < n_g
        gi = jnp.clip(gidx, 0, n_g - 1)
        pix2d = (gi * g)[:, None] + jnp.arange(g)[None, :]
        valid2d = gvalid[:, None] & (pix2d < n)
        if hw is not None:
            valid2d = valid2d & in_image(pix2d)
        mask = valid2d.reshape(-1).astype(jnp.float32)
        colors = (
            taps[gi].astype(jnp.float32) * plane_scale
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
                schedule(count), count + 1, mspec, C, mm_dtype=mm_dtype,
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
            # max(cnt, 1): a bucketed batch can in principle land entirely
            # in the pad region; se is then 0 and the step is a no-op
            # (matches the fused kernel's guard) instead of NaN-ing params
            return se / jnp.maximum(cnt, 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        if axis_name:
            grads = jax.lax.psum(grads, axis_name)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    def chunk_step(carry, perm_chunk):
        """k training steps as ONE pallas_call (fused multi-step path)."""
        from lbdrn_msic_tpu.ops.fused_step import fused_multi_step

        params, (m_state, v_state, count) = carry
        k = perm_chunk.shape[0]
        X, Yc, Mc = jax.vmap(make_batch)(perm_chunk)
        lrs = schedule(count + jnp.arange(k))
        params, m_state, v_state, losses = fused_multi_step(
            params, m_state, v_state, X, Yc, Mc, lrs, count + 1, mspec, C,
            mm_dtype=mm_dtype,
        )
        return (params, (m_state, v_state, count + k)), losses

    def run_epoch_steps(params, opt_state, perm):
        if multi_k:
            n_chunks = steps_per_epoch // multi_k
            rem = steps_per_epoch - n_chunks * multi_k
            chunks = perm[: n_chunks * multi_k].reshape(
                n_chunks, multi_k, bs // g
            )
            (params, opt_state), losses = jax.lax.scan(
                chunk_step, (params, opt_state), chunks
            )
            losses = losses.reshape(-1)
            if rem:
                (params, opt_state), rl = chunk_step(
                    (params, opt_state), perm[n_chunks * multi_k :]
                )
                losses = jnp.concatenate([losses, rl])
            return (params, opt_state), losses
        return jax.lax.scan(train_step, (params, opt_state), perm)

    def epoch_body(carry, epoch_idx):
        params, opt_state, best_params, best_mse, best_epoch, key = carry
        key, pk = jax.random.split(key)
        perm = jax.random.permutation(pk, n_g)
        perm = jnp.concatenate(
            [perm, jnp.full((pad_n_g - n_g,), n_g, dtype=perm.dtype)]
        ).reshape(steps_per_epoch, bs // g)
        (params, opt_state), losses = run_epoch_steps(params, opt_state, perm)

        if tspec.epochs == 1:
            best_params, best_mse = params, losses.mean()
            best_epoch = jnp.int32(1)
        else:
            def run_eval(args):
                params, best_params, best_mse, best_epoch = args
                # "full" staging: evals slice the tap matrix (bit-identical
                # to the slice path, ~10x cheaper); needs W%g==0 so row
                # blocks align to granules, and colors-only features
                tap_ok = (
                    taps is not None and not fspec.use_coords and W % g == 0
                )
                mse = dataset_mse(
                    params, plane, plane_scale, labels, label_scale,
                    fspec, mspec, H, W, block_rows, padded_in,
                    axis_name, axis_size, x_cache=x_cache,
                    fast_act=use_fused,
                    tap_cache=taps if tap_ok else None,
                    tap_g=g if tap_ok else 1,
                    hw=hw,
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
        "Ks", "fspec", "mspec", "tspec", "H", "W", "C", "tap_dtypes",
        "use_fused", "staging", "multi_k", "mm_dtype", "img_of",
    ),
)
def fit_rate_experts(
    img: jnp.ndarray,
    Ks: tuple,
    key: jax.Array,
    fspec: FeatureSpec,
    mspec: ModelSpec,
    tspec: TrainSpec,
    H: int,
    W: int,
    C: int,
    tap_dtypes: tuple,
    use_fused: bool = False,
    staging: str = "full",
    multi_k: int = 0,
    mm_dtype: str | None = None,
    img_of: tuple | None = None,
    hws: jnp.ndarray | None = None,
) -> FitResult:
    """Train one network per rate point K — all E=len(Ks) experts batched in
    ONE jitted program on ONE chip.

    The reference fans rate points out as independent shell jobs
    (reference run.sh:34-40), each re-running the full training loop; a
    ~11k-param MLP leaves the MXU nearly idle, so here the sweep *is* the
    batch dimension: every step gathers each expert's taps with one shared
    pixel permutation (all jobs use the same seed → identical shuffles,
    encode.py:200-206 semantics), stacks them (E, B, F), and runs batched
    einsum matmuls + one Adam update over expert-stacked params.  Expert e's
    loss only depends on expert e's params, so gradients — and therefore the
    whole optimizer trajectory, eval cadence, and best-params selection —
    match the single-job path per expert (up to matmul batching reduction
    order).

    Labels share storage: LSB_K = img & (2^K - 1), so one uint16 label
    matrix of the raw image serves every expert (masked per expert after the
    gather).  Taps are per-expert (the MSB plane depends on K), each staged
    in its own minimal dtype.

    Cross-image experts (VERDICT r3 #2): `img` may be a TUPLE of I
    same-shape (C, H, W) images (or a stacked (I, C, H, W) array, split
    on entry) with `img_of` a static length-E tuple mapping each
    expert to its image — experts are then (image, K) pairs of one shape,
    so a dataset encode (the reference's 13-image run.sh outer loop,
    run.sh:29-40) fills the expert batch across images instead of leaving
    the MXU idle per tiny per-image job.  Label stores are per unique
    image (one gather per image per step, shared by its K experts).

    `hws` (traced (E, 2) int32): per-expert ACTUAL (height, width) when
    the static H/W are shape-bucket dims and the stacked images are
    bucket-padded (codec._pad_to_bucket) — each expert's out-of-image
    pixels are masked out of its batches and eval independently (the
    expert analogue of fit's `hw`), so images of DIFFERENT shapes in one
    bucket train together in one compiled program.

    Returns a FitResult whose leaves carry a leading E axis.

    `staging` is "full" (the (2D+1)^2 tap matrix per expert) or "banded"
    (per-row horizontal taps, 5x fewer staged bytes — the path for
    full-size Gaofen scenes; `tap_dtypes` are RAW plane dtypes there).
    This loop is staged-only: it has no gather fallback, so it requires
    color features (callers: codec._experts_compatible).
    """
    assert fspec.use_colors, "fit_rate_experts is staged-only (needs colors)"
    if staging not in ("full", "banded"):
        raise ValueError(f"unknown staging mode {staging!r}")
    E = len(Ks)
    # images arrive as a TUPLE pytree (preferred) so per-expert reads are
    # Python indexing, not device slices: XLA materialized the squeeze of
    # a stacked (I, C, H, W) image with a pathological 32x-padded layout
    # (13.7 GB for ONE GF-2 scene — the r5 flagship OOM), and a tuple
    # leaves each image in its original committed buffer.
    if isinstance(img, (tuple, list)):
        imgs = tuple(img)
    elif img.ndim == 4:
        imgs = tuple(img[i] for i in range(img.shape[0]))
    else:
        imgs = (img,)
    if img_of is None:
        img_of = (0,) * E
    assert len(img_of) == E and max(img_of) < len(imgs)
    used_imgs = sorted(set(img_of))
    dim_in = fspec.feature_dim(C)
    padded_in = pad_dim(dim_in)
    n = H * W
    bs = min(tspec.batch_size, n)
    g = tspec.sample_granule
    if g > 1 and bs % g:
        g = 1
    if staging == "banded":
        Wg, ng_row = banded_geometry(W, g)
        n_g = H * ng_row
    else:
        ng_row = 0
        n_g = -(-n // g)
    bpg = bs // g
    steps_per_epoch = -(-n_g // bpg)
    pad_n_g = steps_per_epoch * bpg
    block_rows = min(H, max(1, (1 << 17) // max(W, 1)))
    n_colors = fspec.num_color_features(C)

    # per-expert staging: padded plane, scale, tap matrix / row taps
    planes, scales, lscales, taps_g, row_taps = [], [], [], [], []
    for e in range(E):
        msb, _ = split_msb_lsb(imgs[img_of[e]], jnp.asarray(Ks[e], jnp.int32))
        plane, scale = pad_plane(msb, fspec.D)
        planes.append(plane)
        scales.append(scale)
        lscales.append(jnp.float32(lsb_scale(Ks[e])))
        if staging == "banded":
            row_taps.append(
                build_row_taps(plane, fspec, H, W, g, jnp.dtype(tap_dtypes[e]))
            )
        else:
            taps_g.append(
                build_tap_matrix(plane, fspec, H, W, jnp.dtype(tap_dtypes[e]), g=g)
            )
    # planes stay a LIST: stacking them and slicing planes[e] back out in
    # the eval made XLA materialize full-scene copies with a pathological
    # padded layout (the r5 flagship crash; see the `imgs` tuple note
    # above) — Python indexing keeps each plane in its own buffer
    scales = jnp.stack(scales)
    lscales = jnp.stack(lscales)
    kmasks = jnp.asarray([(1 << k) - 1 for k in Ks], jnp.uint16)  # (E,)

    # shared label storage: raw image pixels; LSB_K = pixel & (2^K - 1).
    # One store per unique image, shared by every K expert of that image.
    raw_stores = raw_gs = None
    if g == 1:
        raw_stores = {
            i: build_granule_labels(imgs[i], H, W, LABEL_STORE_G)
            for i in used_imgs
        }
    elif staging == "banded":
        raw_gs = {i: build_banded_labels(imgs[i], H, W, g) for i in used_imgs}
    else:
        raw_gs = {i: build_granule_labels(imgs[i], H, W, g) for i in used_imgs}

    key, init_key = jax.random.split(key)
    # same init key per expert == per-job init (jobs share the seed)
    p1 = init_params(init_key, dim_in, C, mspec, pad_input_to=padded_in)
    paramsE = jax.tree.map(lambda a: jnp.broadcast_to(a, (E, *a.shape)), p1)
    paramsE = jax.tree.map(jnp.array, paramsE)  # materialize (donation-safe)

    if use_fused:
        from lbdrn_msic_tpu.ops.fused_step import pick_tile

        if not pick_tile(bs, padded_in, C, mspec):
            use_fused = False

    # multi-step chunking (see fit_core: measured slower than per-step on
    # v5e at the bench shapes, so opt-in only); the chunk is capped so the
    # staged (k, E, bs, padded_in) batch buffer stays under ~512 MB.
    # Per-expert masks (hws) keep the per-step path (the multi-step kernel
    # shares one mask across experts).
    if hws is not None:
        multi_k = 0
    if use_fused and multi_k:
        from lbdrn_msic_tpu.ops.fused_step import pick_tile as _pt

        if _pt(bs, padded_in, C, mspec) == bs:
            cap = max(1, (512 << 20) // (E * bs * padded_in * 4))
            multi_k = min(multi_k, cap, steps_per_epoch)
            if multi_k < 2:
                multi_k = 0
        else:
            multi_k = 0
    else:
        multi_k = 0

    schedule = make_lr_schedule(tspec, steps_per_epoch)
    if use_fused:
        zeros = jax.tree.map(jnp.zeros_like, paramsE)
        opt_state = (zeros, zeros, jnp.int32(0))  # (m, v, step count)
    else:
        opt = optax.adam(schedule)
        opt_state = opt.init(paramsE)

    fspec_nc = dataclasses.replace(fspec, use_coords=False)

    def make_batch(gidx):
        """shared granule ids -> x (E, bs, padded_in), y (E, bs, C),
        mask (bs,) shared — or (E, bs) per expert when `hws` masks each
        expert's bucket pad independently."""
        gvalid = gidx < n_g
        gi = jnp.clip(gidx, 0, n_g - 1)
        if staging == "banded":
            jj2d = (gi % ng_row * g)[:, None] + jnp.arange(g)[None, :]
            ii2d = jnp.broadcast_to((gi // ng_row)[:, None], jj2d.shape)
            mask = (gvalid[:, None] & (jj2d < W)).reshape(-1).astype(jnp.float32)
            xs = [
                banded_window_features(
                    row_taps[e], scales[e], gi, fspec_nc, H, W, g
                )
                for e in range(E)
            ]
        else:
            pix2d = (gi * g)[:, None] + jnp.arange(g)[None, :]
            ii2d, jj2d = pix2d // W, pix2d % W
            mask = (gvalid[:, None] & (pix2d < n)).reshape(-1).astype(jnp.float32)
            xs = [
                (taps_g[e][gi].astype(jnp.float32) * scales[e]).reshape(bs, n_colors)
                for e in range(E)
            ]
        if hws is not None:
            ii = ii2d.reshape(-1)[None, :]  # (1, bs) bucket-grid rows
            jj = jj2d.reshape(-1)[None, :]
            in_img = (ii < hws[:, 0:1]) & (jj < hws[:, 1:2])  # (E, bs)
            mask = mask[None, :] * in_img.astype(jnp.float32)
        x = jnp.stack(xs)  # (E, bs, n_colors)
        if fspec.use_coords:
            coords = _coord_features(
                ii2d.reshape(-1), jj2d.reshape(-1), H, W, fspec
            )
            x = jnp.concatenate(
                [jnp.broadcast_to(coords, (E, *coords.shape)), x], axis=-1
            )
        x = pad_features(x, padded_in)
        if g == 1:  # one label gather per unique image
            rows_by_img = {
                i: gather_pixel_labels(raw_stores[i], gi, C) for i in used_imgs
            }
        else:
            rows_by_img = {i: raw_gs[i][gi].reshape(bs, C) for i in used_imgs}
        if len(used_imgs) == 1:
            rows_E = rows_by_img[used_imgs[0]][None, :, :]
        else:
            rows_E = jnp.stack([rows_by_img[i] for i in img_of])
        y = (rows_E & kmasks[:, None, None]).astype(jnp.float32)
        y = y * lscales[:, None, None]
        return x, y, mask

    def dataset_mse_experts_unrolled(paramsE):
        """Per-expert eval as E independent block scans (flagship-size
        scenes): the BATCHED eval below hard-crashes the TPU worker at
        Gaofen-bucket shapes with >= 2 distinct experts (r5; exact same
        program runs when identical experts CSE to one) — this unrolled
        form mirrors the proven single-expert `dataset_mse` structure
        and is bit-identical per expert (the batched einsum computes
        each expert's matmul independently)."""
        R = block_rows
        n_blocks = -(-H // R)
        tap_ok = staging == "full" and not fspec.use_coords and W % g == 0

        def mse_one(e):
            p_e = jax.tree.map(lambda a: a[e : e + 1], paramsE)

            def body(acc, b):
                r0 = jnp.minimum(b * R, H - R)
                if tap_ok:
                    tb = jax.lax.dynamic_slice(
                        taps_g[e], (r0 * W // g, 0),
                        (R * W // g, taps_g[e].shape[1]),
                    )
                    x = tb.astype(jnp.float32).reshape(R * W, -1) * scales[e]
                else:
                    x = row_block_features(
                        planes[e], scales[e], r0, fspec, H, W, R
                    )
                pred = forward_experts(
                    p_e, pad_features(x[None], padded_in), mspec,
                    fast_act=use_fused,
                )[0]
                rows = r0 + jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
                valid = (rows >= b * R) & (rows < H)
                m = jnp.broadcast_to(valid, (R, W)).reshape(-1)
                if hws is not None:
                    cols = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
                    rows2 = jnp.broadcast_to(rows, (R, W))
                    m = (
                        m
                        & (rows2.reshape(-1) < hws[e, 0])
                        & (cols.reshape(-1) < hws[e, 1])
                    )
                yb = jax.lax.dynamic_slice(
                    imgs[img_of[e]], (0, r0, 0), (C, R, W)
                )
                yr = jnp.transpose(yb.reshape(C, R * W), (1, 0))
                y = (yr & kmasks[e]).astype(jnp.float32) * lscales[e]
                sse = (((pred - y) ** 2) * m.astype(jnp.float32)[:, None]).sum()
                return acc + sse, None

            sse, _ = jax.lax.scan(
                body, jnp.float32(0.0), jnp.arange(n_blocks)
            )
            if hws is not None:
                n_eff = (hws[e, 0] * hws[e, 1]).astype(jnp.float32)
                return sse / (n_eff * C)
            return sse / (n * C)

        return jnp.stack([mse_one(e) for e in range(E)])

    def dataset_mse_experts(paramsE):
        """Full-image MSE per expert: tap-matrix slices when available
        (bit-identical, ~10x cheaper than rebuilding features — see
        dataset_mse), else the slice path (scan over row blocks)."""
        if n > EVAL_UNROLL_PX:
            return dataset_mse_experts_unrolled(paramsE)
        R = block_rows
        n_blocks = -(-H // R)
        tap_ok = staging == "full" and not fspec.use_coords and W % g == 0

        def body(acc, b):
            r0 = jnp.minimum(b * R, H - R)
            if tap_ok:
                def xs(e):
                    tb = jax.lax.dynamic_slice(
                        taps_g[e], (r0 * W // g, 0),
                        (R * W // g, taps_g[e].shape[1]),
                    )
                    return tb.astype(jnp.float32).reshape(R * W, -1) * scales[e]
            else:
                def xs(e):
                    return row_block_features(
                        planes[e], scales[e], r0, fspec, H, W, R
                    )
            x = jnp.stack([xs(e) for e in range(E)])
            pred = forward_experts(
                paramsE, pad_features(x, padded_in), mspec,
                fast_act=use_fused,
            )
            rows = r0 + jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
            valid = (rows >= b * R) & (rows < H)
            m = jnp.broadcast_to(valid, (R, W)).reshape(-1)
            if hws is not None:
                cols = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
                rows2 = jnp.broadcast_to(rows, (R, W))
                mE = (
                    m[None, :]
                    & (rows2.reshape(-1)[None, :] < hws[:, 0:1])
                    & (cols.reshape(-1)[None, :] < hws[:, 1:2])
                )  # (E, R*W)
            else:
                mE = m[None, :]
            yr_by_img = {}
            for i in used_imgs:
                yb = jax.lax.dynamic_slice(imgs[i], (0, r0, 0), (C, R, W))
                yr_by_img[i] = jnp.transpose(yb.reshape(C, R * W), (1, 0))
            if len(used_imgs) == 1:
                yr_E = yr_by_img[used_imgs[0]][None, :, :]
            else:
                yr_E = jnp.stack([yr_by_img[i] for i in img_of])
            y = (yr_E & kmasks[:, None, None]).astype(jnp.float32)
            y = y * lscales[:, None, None]
            sse = (((pred - y) ** 2) * mE[:, :, None]).sum(axis=(1, 2))
            return acc + sse, None

        sse, _ = jax.lax.scan(body, jnp.zeros((E,), jnp.float32), jnp.arange(n_blocks))
        if hws is not None:
            n_eff = (hws[:, 0] * hws[:, 1]).astype(jnp.float32)  # (E,)
            return sse / (n_eff * C)
        return sse / (n * C)

    def train_step(carry, gidx):
        paramsE, opt_state = carry
        x, y, mask = make_batch(gidx)

        if use_fused:
            from lbdrn_msic_tpu.ops.fused_step import fused_expert_step

            m_state, v_state, count = opt_state
            paramsE, m_state, v_state, loss_e = fused_expert_step(
                paramsE, m_state, v_state, x, y, mask,
                schedule(count), count + 1, mspec, C, mm_dtype=mm_dtype,
            )
            return (paramsE, (m_state, v_state, count + 1)), loss_e

        def loss_fn(p):
            pred = forward_experts(p, x, mspec)
            mE = mask if mask.ndim == 2 else mask[None, :]  # (E|1, bs)
            se = ((pred - y) ** 2 * mE[:, :, None]).sum(axis=(1, 2))
            loss_e = se / (jnp.maximum(mE.sum(axis=-1), 1.0) * C)
            # experts are independent: d(sum)/d(p_e) == d(loss_e)/d(p_e)
            return loss_e.sum(), loss_e

        (_, loss_e), grads = jax.value_and_grad(loss_fn, has_aux=True)(paramsE)
        updates, opt_state = opt.update(grads, opt_state, paramsE)
        return (optax.apply_updates(paramsE, updates), opt_state), loss_e

    def chunk_step(carry, perm_chunk):
        """k expert steps as ONE pallas_call (fused multi-step path)."""
        from lbdrn_msic_tpu.ops.fused_step import fused_expert_multi_step

        paramsE, (m_state, v_state, count) = carry
        k = perm_chunk.shape[0]
        X, Yc, Mc = jax.vmap(make_batch)(perm_chunk)  # (k, E, bs, F) etc.
        lrs = schedule(count + jnp.arange(k))
        paramsE, m_state, v_state, losses = fused_expert_multi_step(
            paramsE, m_state, v_state, X, Yc, Mc, lrs, count + 1, mspec, C,
            mm_dtype=mm_dtype,
        )  # losses: (E, k)
        return (paramsE, (m_state, v_state, count + k)), jnp.transpose(losses)

    def run_epoch_steps(paramsE, opt_state, perm):
        if multi_k:
            n_chunks = steps_per_epoch // multi_k
            rem = steps_per_epoch - n_chunks * multi_k
            chunks = perm[: n_chunks * multi_k].reshape(n_chunks, multi_k, bpg)
            (paramsE, opt_state), losses = jax.lax.scan(
                chunk_step, (paramsE, opt_state), chunks
            )  # (n_chunks, k, E)
            losses = losses.reshape(-1, E)
            if rem:
                (paramsE, opt_state), rl = chunk_step(
                    (paramsE, opt_state), perm[n_chunks * multi_k :]
                )
                losses = jnp.concatenate([losses, rl])
            return (paramsE, opt_state), losses
        return jax.lax.scan(train_step, (paramsE, opt_state), perm)

    def epoch_body(carry, epoch_idx):
        paramsE, opt_state, best_params, best_mse, best_epoch, key = carry
        key, pk = jax.random.split(key)
        perm = jax.random.permutation(pk, n_g)  # ONE shared shuffle
        perm = jnp.concatenate(
            [perm, jnp.full((pad_n_g - n_g,), n_g, dtype=perm.dtype)]
        ).reshape(steps_per_epoch, bpg)
        (paramsE, opt_state), losses = run_epoch_steps(
            paramsE, opt_state, perm
        )  # losses: (steps, E)

        if tspec.epochs == 1:
            best_params, best_mse = paramsE, losses.mean(axis=0)
            best_epoch = jnp.full((E,), 1, jnp.int32)
        else:
            def run_eval(args):
                paramsE, best_params, best_mse, best_epoch = args
                mse = dataset_mse_experts(paramsE)  # (E,)
                better = mse < best_mse
                new_best = jax.tree.map(
                    lambda new, old: jnp.where(
                        better.reshape(E, *([1] * (new.ndim - 1))), new, old
                    ),
                    paramsE,
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
                (paramsE, best_params, best_mse, best_epoch),
            )
        return (
            (paramsE, opt_state, best_params, best_mse, best_epoch, key),
            (losses.mean(axis=0), jnp.transpose(losses)),  # ((E,), (E, steps))
        )

    best0 = jax.tree.map(jnp.zeros_like, paramsE)
    carry0 = (
        paramsE, opt_state, best0,
        jnp.full((E,), 1e6, jnp.float32), jnp.full((E,), -1, jnp.int32), key,
    )
    carry, (epoch_losses, step_losses) = jax.lax.scan(
        epoch_body, carry0, jnp.arange(tspec.epochs)
    )
    paramsE, _, best_params, best_mse, best_epoch, _ = carry
    return FitResult(
        params=best_params,
        best_mse=best_mse,
        best_epoch=best_epoch,
        final_params=paramsE,
        epoch_losses=jnp.transpose(epoch_losses),  # (E, epochs)
        step_losses=jnp.transpose(step_losses, (1, 0, 2)),  # (E, epochs, steps)
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "fspec", "mspec", "tspec", "H", "W", "C", "staging", "tap_dtype",
        "use_fused", "multi_k", "mm_dtype",
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
    staging: str = "full",
    tap_dtype: str = "int16",
    use_fused: bool = False,
    multi_k: int | None = None,
    mm_dtype: str | None = None,
    hw: jnp.ndarray | None = None,
) -> FitResult:
    """Single-device fit (see fit_core).  `hw` (traced): actual (H, W)
    when the static H/W are bucket dims — different actual shapes in one
    bucket reuse this program's compile."""
    return fit_core(
        plane, plane_scale, labels, label_scale, key,
        fspec, mspec, tspec, H, W, C, staging, tap_dtype,
        use_fused=use_fused, multi_k=multi_k, mm_dtype=mm_dtype, hw=hw,
    )
