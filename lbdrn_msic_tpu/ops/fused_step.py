"""Fused SIREN training step as a single Pallas TPU kernel.

One `pallas_call` performs, entirely on-chip for one batch:

    forward (nl+1 MXU matmuls, sin/sigmoid on the VPU)
    -> masked-MSE loss
    -> hand-derived backward (transposed MXU matmuls)
    -> Adam update with torch bias-correction semantics
       (reference encode.py:84 uses torch.optim.Adam defaults)

The batch is tiled over a 1-D grid; weight-gradient accumulators live in
VMEM scratch across tiles and the Adam update fires on the last tile, so
activations never round-trip to HBM and parameters are updated in place
(`input_output_aliases`).  The XLA path (train/loop.py) remains the
reference implementation and the only path used under data parallelism
(gradients must cross the psum before Adam there).

Layout notes: the input dim is already MXU-lane padded by models/siren.py;
the batch tile (1024) is a multiple of the f32 sublane (8); the tiny output
dim (C bands) rides as the minor dimension of the last matmul.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbdrn_msic_tpu.core.config import ModelSpec
from lbdrn_msic_tpu.models.siren import SirenParams

ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-8
TILE_ALIGN = 8  # f32 sublane; batch must divide into aligned tiles
_VMEM_BUDGET = 48 << 20

# sincos: minimax polynomials on [-pi/2, pi/2] (degree 9 odd / 8 even;
# fit residual 3.4e-9 / 4.7e-8 — below f32 roundoff).  Constants are
# f32-rounded; _PI_LO is pi - f32(pi) so the 2-term Cody-Waite reduction
# keeps |r| error ~ ulp(u) for the |u| < ~1e3 preactivations seen here.
_INV_PI = 0.31830987449645996
_PI_HI = 3.14159274101257324
_PI_LO = -8.742277657347586e-08
_SIN_P = (1.0, -0.16666647791862488, 0.008332899771630764,
          -0.00019800907466560602, 2.5905085294652963e-06)
_COS_P = (0.9999999403953552, -0.4999990463256836, 0.04166358709335327,
          -0.001385371433570981, 2.31541689572623e-05)


def sincos(u):
    """(sin u, cos u) from ONE shared range reduction — the fused kernels'
    activation path.

    XLA's `jnp.sin`/`jnp.cos` each pay a full-range reduction with quadrant
    selects; a SIREN training step needs BOTH (sin forward, cos backward) of
    the same preactivation, and the transcendentals are ~45% of the fused
    step's time at the bench shape (scripts/profiling/kernel_prof.py).  Here
    u = k*pi + r with one round, sign (-1)^k folded into both results, and
    two short Horner polynomials share r^2.

    Absolute error (measured vs f64): < 2e-7 for |u| <= 3, < 2e-6 for
    |u| <= 30, growing ~ulp(u) from the reduction (tests/test_fused_step.py
    ::test_sincos_accuracy).  Training-loss impact is below bf16 matmul
    noise; the pure-JAX oracle keeps exact jnp.sin (`reference_train_step`).
    """
    k = jnp.round(u * _INV_PI)
    r = (u - k * _PI_HI) - k * _PI_LO
    f = k * 0.5
    f = f - jnp.round(f)
    sg = 1.0 - 8.0 * (f * f)  # (-1)^k
    r2 = r * r
    ps = jnp.float32(_SIN_P[4])
    pc = jnp.float32(_COS_P[4])
    for s_c, c_c in zip(_SIN_P[3::-1], _COS_P[3::-1]):
        ps = ps * r2 + s_c
        pc = pc * r2 + c_c
    return (sg * r) * ps, sg * pc


def pick_tile(B: int, padded_in: int, dim_out: int, mspec) -> int:
    """Largest batch tile that divides B and fits the VMEM budget.

    Per-grid-step overhead (DMA issue + semaphores, ~20us measured through
    the remote runtime) dwarfs this kernel's compute, so the tile should be
    as large as VMEM allows — ideally the whole batch (grid == E).
    """
    L = mspec.num_layers + 1
    per_row = 4 * (padded_in + dim_out + 2 * (L - 1) * mspec.base_channel + 8)
    t = B
    while t > TILE_ALIGN and (B % t or t * per_row > _VMEM_BUDGET):
        t //= 2
    if B % t or t % TILE_ALIGN:
        return 0
    return t


def _sigmoid(z):
    return 1.0 / (1.0 + jnp.exp(-z))


def _mm_dtype(name: str | None):
    return None if name is None else jnp.dtype(name)


def _fwd_bwd(x, y, mask, ws, bs, w0s, L, mm_dtype=None):
    """Shared forward + hand-derived backward for one batch tile.

    `ws`/`bs` are layer VALUES (already loaded from their refs); every
    fused kernel body routes through this so the math exists once.
    Returns (sse, dws, dbs): the masked squared-error sum and the
    *unscaled* gradient contributions d(sum se)/dW of this tile.

    `mm_dtype`: optional matmul input cast.  `jnp.bfloat16` gives
    single-pass MXU matmuls with f32 accumulation — the same contraction
    the XLA path's default TPU matmul precision performs; None keeps full
    f32 (multi-pass).
    """

    def dot(a, b):
        if mm_dtype is not None:
            a, b = a.astype(mm_dtype), b.astype(mm_dtype)
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    hs = [x]  # hs[l] feeds layer l
    coss = []  # w0 * cos(w0 z_l) backward multipliers
    h = x
    for l in range(L - 1):
        z = dot(h, ws[l]) + bs[l]
        s, c = sincos(w0s[l] * z)
        coss.append(w0s[l] * c)
        h = s
        hs.append(h)
    z_last = dot(h, ws[L - 1]) + bs[L - 1]
    p = _sigmoid(z_last)

    diff = (p - y) * mask
    sse = jnp.sum(diff * diff)

    g = 2.0 * diff * (p * (1.0 - p))  # d(sum se)/dz_last
    dws: List[jnp.ndarray] = [None] * L
    dbs: List[jnp.ndarray] = [None] * L
    for l in range(L - 1, -1, -1):
        dws[l] = dot(hs[l].T, g)
        dbs[l] = jnp.sum(g, axis=0, keepdims=True)
        if l > 0:
            g = dot(g, ws[l].T) * coss[l - 1]
    return sse, dws, dbs


def _adam(theta, grad, m, v, lr, c1, c2):
    """One Adam update with torch bias-correction semantics (shared by all
    kernel bodies and the pure-JAX oracle)."""
    m_new = ADAM_B1 * m + (1.0 - ADAM_B1) * grad
    v_new = ADAM_B2 * v + (1.0 - ADAM_B2) * grad * grad
    theta_new = theta - lr * (m_new * c1) / (jnp.sqrt(v_new * c2) + ADAM_EPS)
    return theta_new, m_new, v_new


def _kernel(
    n_layers: int,
    w0s: Tuple[float, ...],
    mm_dtype,
    *refs,
):
    """refs layout (see fused_train_step for construction):
    scalars_ref,                                   # (1, 4) SMEM: lr, c1, c2, inv_scale
    x_ref, y_ref, mask_ref,                        # batch tile
    w_refs..., b_refs...,                          # params (VMEM)
    mw_refs..., vw_refs..., mb_refs..., vb_refs...,# adam state
    out: new_w..., new_b..., new_mw..., new_vw..., new_mb..., new_vb..., loss
    scratch: acc_dw..., acc_db..., loss_acc
    """
    L = n_layers
    (scalars_ref, x_ref, y_ref, mask_ref) = refs[:4]
    pos = 4
    w_refs = refs[pos : pos + L]; pos += L
    b_refs = refs[pos : pos + L]; pos += L
    mw_refs = refs[pos : pos + L]; pos += L
    vw_refs = refs[pos : pos + L]; pos += L
    mb_refs = refs[pos : pos + L]; pos += L
    vb_refs = refs[pos : pos + L]; pos += L
    nw_refs = refs[pos : pos + L]; pos += L
    nb_refs = refs[pos : pos + L]; pos += L
    nmw_refs = refs[pos : pos + L]; pos += L
    nvw_refs = refs[pos : pos + L]; pos += L
    nmb_refs = refs[pos : pos + L]; pos += L
    nvb_refs = refs[pos : pos + L]; pos += L
    loss_ref = refs[pos]; pos += 1
    acc_dw = refs[pos : pos + L]; pos += L
    acc_db = refs[pos : pos + L]; pos += L
    loss_acc = refs[pos]

    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    @pl.when(t == 0)
    def _zero():
        for l in range(L):
            acc_dw[l][...] = jnp.zeros_like(acc_dw[l])
            acc_db[l][...] = jnp.zeros_like(acc_db[l])
        loss_acc[...] = jnp.zeros_like(loss_acc)

    x = x_ref[...]
    y = y_ref[...]
    mask = mask_ref[...]  # (TILE, 1)

    sse, dws, dbs = _fwd_bwd(
        x, y, mask,
        [w[...] for w in w_refs], [b[...] for b in b_refs],
        w0s, L, mm_dtype,
    )
    # masked squared error; the 1/(count*C) scale is applied at the end
    loss_acc[...] = loss_acc[...] + sse.reshape(1, 1)
    for l in range(L):
        acc_dw[l][...] += dws[l]
        acc_db[l][...] += dbs[l]

    @pl.when(t == n_tiles - 1)
    def _update():
        lr = scalars_ref[0, 0]
        c1 = scalars_ref[0, 1]  # 1/(1-b1^t)
        c2 = scalars_ref[0, 2]  # 1/(1-b2^t)
        inv_scale = scalars_ref[0, 3]  # 1/(count*C)
        for l in range(L):
            for grad, theta, m, v, nt, nm, nv in (
                (acc_dw[l][...] * inv_scale, w_refs[l], mw_refs[l], vw_refs[l],
                 nw_refs[l], nmw_refs[l], nvw_refs[l]),
                (acc_db[l][...] * inv_scale, b_refs[l], mb_refs[l], vb_refs[l],
                 nb_refs[l], nmb_refs[l], nvb_refs[l]),
            ):
                nt[...], nm[...], nv[...] = _adam(
                    theta[...], grad, m[...], v[...], lr, c1, c2
                )
        loss_ref[...] = loss_acc[...] * inv_scale


@functools.partial(
    jax.jit, static_argnames=("mspec", "dim_out", "tile", "mm_dtype")
)
def fused_train_step(
    params: SirenParams,
    m_state: SirenParams,
    v_state: SirenParams,
    x: jnp.ndarray,
    y: jnp.ndarray,
    mask: jnp.ndarray,
    lr: jnp.ndarray,
    step: jnp.ndarray,
    mspec: ModelSpec,
    dim_out: int,
    tile: int | None = None,
    mm_dtype: str | None = None,
):
    """One fused training step.

    x: (B, padded_in) f32; y: (B, dim_out) f32; mask: (B,) f32;
    step: 1-indexed Adam timestep; mm_dtype: see _fwd_bwd.
    Returns (params', m', v', loss).
    """
    L = mspec.num_layers + 1
    w0s = tuple(
        [mspec.w0_initial] + [mspec.w0] * (mspec.num_layers - 1) + [0.0]
    )
    B = x.shape[0]
    TILE = tile or pick_tile(B, x.shape[-1], dim_out, mspec)
    assert TILE and B % TILE == 0, f"batch {B} has no aligned tile"
    n_tiles = B // TILE

    tstep = step.astype(jnp.float32)
    c1 = 1.0 / (1.0 - ADAM_B1**tstep)
    c2 = 1.0 / (1.0 - ADAM_B2**tstep)
    cnt = jnp.maximum(mask.sum(), 1.0)
    inv_scale = 1.0 / (cnt * dim_out)
    scalars = jnp.stack([lr.astype(jnp.float32), c1, c2, inv_scale]).reshape(1, 4)

    mask2 = mask.reshape(B, 1)
    ws, bs = list(params.weights), [b.reshape(1, -1) for b in params.biases]
    mws, mbs = list(m_state.weights), [b.reshape(1, -1) for b in m_state.biases]
    vws, vbs = list(v_state.weights), [b.reshape(1, -1) for b in v_state.biases]

    full = lambda a: pl.BlockSpec(a.shape, lambda t: tuple(0 for _ in a.shape),
                                  memory_space=pltpu.VMEM)
    tile_spec = lambda width: pl.BlockSpec(
        (TILE, width), lambda t: (t, 0), memory_space=pltpu.VMEM
    )

    in_specs = (
        [pl.BlockSpec((1, 4), lambda t: (0, 0), memory_space=pltpu.SMEM)]
        + [tile_spec(x.shape[1]), tile_spec(y.shape[1]), tile_spec(1)]
        + [full(a) for a in ws + bs + mws + vws + mbs + vbs]
    )
    out_shapes = (
        [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in ws + bs + mws + vws + mbs + vbs]
        + [jax.ShapeDtypeStruct((1, 1), jnp.float32)]
    )
    out_specs = (
        [full(a) for a in ws + bs + mws + vws + mbs + vbs]
        + [pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.VMEM)]
    )
    # alias params/adam-state inputs to their outputs (in-place update)
    aliases = {4 + i: i for i in range(6 * L)}

    scratch = (
        [pltpu.VMEM(a.shape, jnp.float32) for a in ws]
        + [pltpu.VMEM(b.shape, jnp.float32) for b in bs]
        + [pltpu.VMEM((1, 1), jnp.float32)]
    )

    kernel = functools.partial(_kernel, L, w0s, _mm_dtype(mm_dtype))
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_shape=out_shapes,
        out_specs=out_specs,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20,  # whole-batch tiles; default 16M OOMs
        ),
    )(scalars, x, y, mask2, *ws, *bs, *mws, *vws, *mbs, *vbs)

    new_w = list(outs[0:L])
    new_b = [b.reshape(-1) for b in outs[L : 2 * L]]
    new_mw = list(outs[2 * L : 3 * L])
    new_vw = list(outs[3 * L : 4 * L])
    new_mb = [b.reshape(-1) for b in outs[4 * L : 5 * L]]
    new_vb = [b.reshape(-1) for b in outs[5 * L : 6 * L]]
    loss = outs[6 * L].reshape(())
    return (
        SirenParams(weights=new_w, biases=new_b),
        SirenParams(weights=new_mw, biases=new_mb),
        SirenParams(weights=new_vw, biases=new_vb),
        loss,
    )


def _kernel_multi(
    n_layers: int,
    w0s: Tuple[float, ...],
    mm_dtype,
    *refs,
):
    """Multi-step kernel body: grid (k,), one TRAINING STEP per grid step.

    Params and Adam state live in the (constant-index) output blocks in
    VMEM across the whole call: copied in from the aliased inputs at s == 0,
    updated in place every step, flushed to HBM once at the end.  The
    per-step batch streams in as pipelined (1, B, F) blocks, so the next
    step's DMA overlaps this step's compute — per-call launch overhead is
    paid once for k steps instead of once per step (measured ~45 us/call
    on v5e through the remote runtime; scripts/profiling/kernel_prof.py).
    """
    L = n_layers
    (scalars_ref, x_ref, y_ref, mask_ref) = refs[:4]
    pos = 4
    w_in = refs[pos : pos + L]; pos += L
    b_in = refs[pos : pos + L]; pos += L
    mw_in = refs[pos : pos + L]; pos += L
    vw_in = refs[pos : pos + L]; pos += L
    mb_in = refs[pos : pos + L]; pos += L
    vb_in = refs[pos : pos + L]; pos += L
    nw = refs[pos : pos + L]; pos += L
    nb = refs[pos : pos + L]; pos += L
    nmw = refs[pos : pos + L]; pos += L
    nvw = refs[pos : pos + L]; pos += L
    nmb = refs[pos : pos + L]; pos += L
    nvb = refs[pos : pos + L]; pos += L
    loss_ref = refs[pos]

    s = pl.program_id(0)

    @pl.when(s == 0)
    def _load():
        for src, dst in (
            (w_in, nw), (b_in, nb), (mw_in, nmw),
            (vw_in, nvw), (mb_in, nmb), (vb_in, nvb),
        ):
            for l in range(L):
                dst[l][...] = src[l][...]

    # scalars live as the full (k, 4) SMEM block, indexed per step
    lr = scalars_ref[s, 0]
    c1 = scalars_ref[s, 1]  # 1/(1-b1^t) for THIS step
    c2 = scalars_ref[s, 2]
    inv_scale = scalars_ref[s, 3]  # 1/(count*C) for THIS step's mask

    x = x_ref[0]
    y = y_ref[0]
    mask = mask_ref[0]  # (B, 1)

    # whole batch in one tile, so gradients are direct products
    sse, dws, dbs = _fwd_bwd(
        x, y, mask,
        [w[...] for w in nw], [b[...] for b in nb],
        w0s, L, mm_dtype,
    )
    loss_ref[s, 0] = sse * inv_scale

    for l in range(L):
        for grad, theta, m, v in (
            (dws[l] * inv_scale, nw[l], nmw[l], nvw[l]),
            (dbs[l] * inv_scale, nb[l], nmb[l], nvb[l]),
        ):
            theta[...], m[...], v[...] = _adam(
                theta[...], grad, m[...], v[...], lr, c1, c2
            )


@functools.partial(
    jax.jit, static_argnames=("mspec", "dim_out", "mm_dtype")
)
def fused_multi_step(
    params: SirenParams,
    m_state: SirenParams,
    v_state: SirenParams,
    X: jnp.ndarray,
    Y: jnp.ndarray,
    masks: jnp.ndarray,
    lrs: jnp.ndarray,
    step0: jnp.ndarray,
    mspec: ModelSpec,
    dim_out: int,
    mm_dtype: str | None = None,
):
    """k sequential fused training steps in ONE pallas_call.

    X: (k, B, padded_in) f32; Y: (k, B, dim_out) f32; masks: (k, B) f32;
    lrs: (k,) per-step learning rates; step0: 1-indexed Adam timestep of
    the first step.  Requires the whole batch to fit one VMEM tile
    (``pick_tile(B, ...) == B`` — callers fall back to fused_train_step
    otherwise).  Returns (params', m', v', losses (k,)).

    Semantically identical to k calls of fused_train_step: the same
    forward/backward/Adam math runs per grid step, only the launch
    overhead and HBM round trips of params/optimizer state are saved.
    """
    L = mspec.num_layers + 1
    w0s = tuple(
        [mspec.w0_initial] + [mspec.w0] * (mspec.num_layers - 1) + [0.0]
    )
    k, B = X.shape[0], X.shape[1]
    assert pick_tile(B, X.shape[-1], dim_out, mspec) == B, (
        f"batch {B} does not fit one VMEM tile; use fused_train_step"
    )

    t = step0.astype(jnp.float32) + jnp.arange(k, dtype=jnp.float32)
    c1 = 1.0 / (1.0 - ADAM_B1**t)
    c2 = 1.0 / (1.0 - ADAM_B2**t)
    cnt = jnp.maximum(masks.sum(axis=1), 1.0)
    inv_scale = 1.0 / (cnt * dim_out)
    scalars = jnp.stack(
        [lrs.astype(jnp.float32), c1, c2, inv_scale], axis=1
    )  # (k, 4)

    masks3 = masks.reshape(k, B, 1)
    ws, bs = list(params.weights), [b.reshape(1, -1) for b in params.biases]
    mws, mbs = list(m_state.weights), [b.reshape(1, -1) for b in m_state.biases]
    vws, vbs = list(v_state.weights), [b.reshape(1, -1) for b in v_state.biases]

    full = lambda a: pl.BlockSpec(a.shape, lambda s: tuple(0 for _ in a.shape),
                                  memory_space=pltpu.VMEM)
    step_tile = lambda width: pl.BlockSpec(
        (1, B, width), lambda s: (s, 0, 0), memory_space=pltpu.VMEM
    )

    in_specs = (
        [pl.BlockSpec((k, 4), lambda s: (0, 0), memory_space=pltpu.SMEM)]
        + [step_tile(X.shape[-1]), step_tile(Y.shape[-1]), step_tile(1)]
        + [full(a) for a in ws + bs + mws + vws + mbs + vbs]
    )
    out_shapes = (
        [jax.ShapeDtypeStruct(a.shape, a.dtype)
         for a in ws + bs + mws + vws + mbs + vbs]
        + [jax.ShapeDtypeStruct((k, 1), jnp.float32)]
    )
    out_specs = (
        [full(a) for a in ws + bs + mws + vws + mbs + vbs]
        + [pl.BlockSpec((k, 1), lambda s: (0, 0), memory_space=pltpu.SMEM)]
    )
    aliases = {4 + i: i for i in range(6 * L)}

    kernel = functools.partial(_kernel_multi, L, w0s, _mm_dtype(mm_dtype))
    outs = pl.pallas_call(
        kernel,
        grid=(k,),
        in_specs=in_specs,
        out_shape=out_shapes,
        out_specs=out_specs,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20,
        ),
    )(scalars, X, Y, masks3, *ws, *bs, *mws, *vws, *mbs, *vbs)

    new_w = list(outs[0:L])
    new_b = [b.reshape(-1) for b in outs[L : 2 * L]]
    new_mw = list(outs[2 * L : 3 * L])
    new_vw = list(outs[3 * L : 4 * L])
    new_mb = [b.reshape(-1) for b in outs[4 * L : 5 * L]]
    new_vb = [b.reshape(-1) for b in outs[5 * L : 6 * L]]
    losses = outs[6 * L].reshape(k)
    return (
        SirenParams(weights=new_w, biases=new_b),
        SirenParams(weights=new_mw, biases=new_mb),
        SirenParams(weights=new_vw, biases=new_vb),
        losses,
    )


def _kernel_expert_multi(
    n_layers: int,
    w0s: Tuple[float, ...],
    mm_dtype,
    *refs,
):
    """Expert multi-step body: grid (E, k), s fastest — expert e runs its k
    sequential steps with params/Adam state resident in the (1, ...) output
    blocks, which Pallas flushes when the expert index advances.  Same math
    as _kernel_multi per expert."""
    L = n_layers
    (scalars_ref, x_ref, y_ref, mask_ref) = refs[:4]
    pos = 4
    w_in = refs[pos : pos + L]; pos += L
    b_in = refs[pos : pos + L]; pos += L
    mw_in = refs[pos : pos + L]; pos += L
    vw_in = refs[pos : pos + L]; pos += L
    mb_in = refs[pos : pos + L]; pos += L
    vb_in = refs[pos : pos + L]; pos += L
    nw = refs[pos : pos + L]; pos += L
    nb = refs[pos : pos + L]; pos += L
    nmw = refs[pos : pos + L]; pos += L
    nvw = refs[pos : pos + L]; pos += L
    nmb = refs[pos : pos + L]; pos += L
    nvb = refs[pos : pos + L]; pos += L
    loss_ref = refs[pos]

    e = pl.program_id(0)
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _load():
        for src, dst in (
            (w_in, nw), (b_in, nb), (mw_in, nmw),
            (vw_in, nvw), (mb_in, nmb), (vb_in, nvb),
        ):
            for l in range(L):
                dst[l][0] = src[l][0]

    # scalars live as the full (k, 4) SMEM block, indexed per step
    lr = scalars_ref[s, 0]
    c1 = scalars_ref[s, 1]
    c2 = scalars_ref[s, 2]
    inv_scale = scalars_ref[s, 3]

    x = x_ref[0, 0]
    y = y_ref[0, 0]
    mask = mask_ref[0]  # (B, 1), shared across experts

    sse, dws, dbs = _fwd_bwd(
        x, y, mask,
        [w[0] for w in nw], [b[0] for b in nb],
        w0s, L, mm_dtype,
    )
    loss_ref[e, s] = sse * inv_scale

    for l in range(L):
        for grad, theta, m, v in (
            (dws[l] * inv_scale, nw[l], nmw[l], nvw[l]),
            (dbs[l] * inv_scale, nb[l], nmb[l], nvb[l]),
        ):
            theta[0], m[0], v[0] = _adam(
                theta[0], grad, m[0], v[0], lr, c1, c2
            )


@functools.partial(
    jax.jit, static_argnames=("mspec", "dim_out", "mm_dtype")
)
def fused_expert_multi_step(
    params: SirenParams,
    m_state: SirenParams,
    v_state: SirenParams,
    X: jnp.ndarray,
    Y: jnp.ndarray,
    masks: jnp.ndarray,
    lrs: jnp.ndarray,
    step0: jnp.ndarray,
    mspec: ModelSpec,
    dim_out: int,
    mm_dtype: str | None = None,
):
    """k sequential steps for E experts in ONE pallas_call (grid (E, k)).

    params/m/v leaves carry a leading expert axis; X: (k, E, B, padded_in)
    (step-major — the natural vmap-over-chunk layout); Y: (k, E, B, dim_out);
    masks: (k, B) shared across experts; lrs: (k,); step0 as in
    fused_multi_step.  Returns (params', m', v', losses (E, k))."""
    L = mspec.num_layers + 1
    w0s = tuple(
        [mspec.w0_initial] + [mspec.w0] * (mspec.num_layers - 1) + [0.0]
    )
    k, E, B = X.shape[0], X.shape[1], X.shape[2]
    assert pick_tile(B, X.shape[-1], dim_out, mspec) == B, (
        f"batch {B} does not fit one VMEM tile; use fused_expert_step"
    )

    t = step0.astype(jnp.float32) + jnp.arange(k, dtype=jnp.float32)
    c1 = 1.0 / (1.0 - ADAM_B1**t)
    c2 = 1.0 / (1.0 - ADAM_B2**t)
    cnt = jnp.maximum(masks.sum(axis=1), 1.0)
    inv_scale = 1.0 / (cnt * dim_out)
    scalars = jnp.stack(
        [lrs.astype(jnp.float32), c1, c2, inv_scale], axis=1
    )  # (k, 4)

    masks3 = masks.reshape(k, B, 1)
    ws = list(params.weights)
    bs = [b.reshape(E, 1, -1) for b in params.biases]
    mws, mbs = list(m_state.weights), [b.reshape(E, 1, -1) for b in m_state.biases]
    vws, vbs = list(v_state.weights), [b.reshape(E, 1, -1) for b in v_state.biases]

    expert_full = lambda a: pl.BlockSpec(
        (1, *a.shape[1:]), lambda e, s: (e,) + (0,) * (a.ndim - 1),
        memory_space=pltpu.VMEM,
    )
    batch_tile = lambda width: pl.BlockSpec(
        (1, 1, B, width), lambda e, s: (s, e, 0, 0), memory_space=pltpu.VMEM
    )

    in_specs = (
        [pl.BlockSpec((k, 4), lambda e, s: (0, 0), memory_space=pltpu.SMEM)]
        + [batch_tile(X.shape[-1]), batch_tile(Y.shape[-1]),
           pl.BlockSpec((1, B, 1), lambda e, s: (s, 0, 0),
                        memory_space=pltpu.VMEM)]
        + [expert_full(a) for a in ws + bs + mws + vws + mbs + vbs]
    )
    out_shapes = (
        [jax.ShapeDtypeStruct(a.shape, a.dtype)
         for a in ws + bs + mws + vws + mbs + vbs]
        + [jax.ShapeDtypeStruct((E, k), jnp.float32)]
    )
    out_specs = (
        [expert_full(a) for a in ws + bs + mws + vws + mbs + vbs]
        + [pl.BlockSpec((E, k), lambda e, s: (0, 0), memory_space=pltpu.SMEM)]
    )
    aliases = {4 + i: i for i in range(6 * L)}

    kernel = functools.partial(
        _kernel_expert_multi, L, w0s, _mm_dtype(mm_dtype)
    )
    outs = pl.pallas_call(
        kernel,
        grid=(E, k),
        in_specs=in_specs,
        out_shape=out_shapes,
        out_specs=out_specs,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20,
        ),
    )(scalars, X, Y, masks3, *ws, *bs, *mws, *vws, *mbs, *vbs)

    new_w = list(outs[0:L])
    new_b = [b.reshape(E, -1) for b in outs[L : 2 * L]]
    new_mw = list(outs[2 * L : 3 * L])
    new_vw = list(outs[3 * L : 4 * L])
    new_mb = [b.reshape(E, -1) for b in outs[4 * L : 5 * L]]
    new_vb = [b.reshape(E, -1) for b in outs[5 * L : 6 * L]]
    losses = outs[6 * L]  # (E, k)
    return (
        SirenParams(weights=new_w, biases=new_b),
        SirenParams(weights=new_mw, biases=new_mb),
        SirenParams(weights=new_vw, biases=new_vb),
        losses,
    )


def _kernel_experts(
    n_layers: int,
    w0s: Tuple[float, ...],
    mm_dtype,
    *refs,
):
    """Expert-batched kernel body: grid (E, n_tiles), t fastest.

    Same math as _kernel per expert; param/state/output refs carry a leading
    singleton expert block dim, batch refs (including the mask and the
    scalar row, whose inv_scale is per expert) are indexed (e, t).  The
    VMEM gradient accumulators are reused across experts (zeroed at each
    expert's first tile, consumed by its Adam update at its last tile).
    """
    L = n_layers
    (scalars_ref, x_ref, y_ref, mask_ref) = refs[:4]
    pos = 4
    w_refs = refs[pos : pos + L]; pos += L
    b_refs = refs[pos : pos + L]; pos += L
    mw_refs = refs[pos : pos + L]; pos += L
    vw_refs = refs[pos : pos + L]; pos += L
    mb_refs = refs[pos : pos + L]; pos += L
    vb_refs = refs[pos : pos + L]; pos += L
    nw_refs = refs[pos : pos + L]; pos += L
    nb_refs = refs[pos : pos + L]; pos += L
    nmw_refs = refs[pos : pos + L]; pos += L
    nvw_refs = refs[pos : pos + L]; pos += L
    nmb_refs = refs[pos : pos + L]; pos += L
    nvb_refs = refs[pos : pos + L]; pos += L
    loss_ref = refs[pos]; pos += 1
    acc_dw = refs[pos : pos + L]; pos += L
    acc_db = refs[pos : pos + L]; pos += L
    loss_acc = refs[pos]

    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(t == 0)
    def _zero():
        for l in range(L):
            acc_dw[l][...] = jnp.zeros_like(acc_dw[l])
            acc_db[l][...] = jnp.zeros_like(acc_db[l])
        loss_acc[0, 0] = 0.0

    x = x_ref[0]
    y = y_ref[0]
    mask = mask_ref[0]  # (TILE, 1), this expert's row of the (E, B) mask

    sse, dws, dbs = _fwd_bwd(
        x, y, mask,
        [w[0] for w in w_refs], [b[0] for b in b_refs],
        w0s, L, mm_dtype,
    )
    loss_acc[0, 0] = loss_acc[0, 0] + sse
    for l in range(L):
        acc_dw[l][...] += dws[l]
        acc_db[l][...] += dbs[l]

    @pl.when(t == n_tiles - 1)
    def _update():
        e = pl.program_id(0)  # scalars stay whole in SMEM; row per expert
        lr = scalars_ref[e, 0]
        c1 = scalars_ref[e, 1]
        c2 = scalars_ref[e, 2]
        inv_scale = scalars_ref[e, 3]
        for l in range(L):
            for grad, theta, m, v, nt, nm, nv in (
                (acc_dw[l][...] * inv_scale, w_refs[l], mw_refs[l], vw_refs[l],
                 nw_refs[l], nmw_refs[l], nvw_refs[l]),
                (acc_db[l][...] * inv_scale, b_refs[l], mb_refs[l], vb_refs[l],
                 nb_refs[l], nmb_refs[l], nvb_refs[l]),
            ):
                nt[0], nm[0], nv[0] = _adam(
                    theta[0], grad, m[0], v[0], lr, c1, c2
                )
        loss_ref[pl.program_id(0), 0] = loss_acc[0, 0] * inv_scale


@functools.partial(
    jax.jit, static_argnames=("mspec", "dim_out", "tile", "mm_dtype")
)
def fused_expert_step(
    params: SirenParams,
    m_state: SirenParams,
    v_state: SirenParams,
    x: jnp.ndarray,
    y: jnp.ndarray,
    mask: jnp.ndarray,
    lr: jnp.ndarray,
    step: jnp.ndarray,
    mspec: ModelSpec,
    dim_out: int,
    tile: int | None = None,
    mm_dtype: str | None = None,
):
    """One fused training step for E experts: grid (E, B/TILE), one kernel.

    params/m/v leaves carry a leading expert axis (weights (E, in, out),
    biases (E, out)); x: (E, B, padded_in); y: (E, B, dim_out); mask: (B,)
    shared or (E, B) per expert (mixed-shape expert batches mask each
    expert's out-of-image pixels independently).  Returns
    (params', m', v', loss (E,)).
    """
    L = mspec.num_layers + 1
    w0s = tuple(
        [mspec.w0_initial] + [mspec.w0] * (mspec.num_layers - 1) + [0.0]
    )
    E, B = x.shape[0], x.shape[1]
    TILE = tile or pick_tile(B, x.shape[-1], dim_out, mspec)
    assert TILE and B % TILE == 0, f"batch {B} has no aligned tile"
    n_tiles = B // TILE

    tstep = step.astype(jnp.float32)
    c1 = 1.0 / (1.0 - ADAM_B1**tstep)
    c2 = 1.0 / (1.0 - ADAM_B2**tstep)
    maskE = mask if mask.ndim == 2 else jnp.broadcast_to(mask, (E, B))
    cnt = jnp.maximum(maskE.sum(axis=1), 1.0)  # (E,)
    inv_scale = 1.0 / (cnt * dim_out)
    scalars = jnp.concatenate(
        [
            jnp.broadcast_to(
                jnp.stack([lr.astype(jnp.float32), c1, c2]), (E, 3)
            ),
            inv_scale[:, None],
        ],
        axis=1,
    )  # (E, 4): lr/c1/c2 shared, inv_scale per expert

    mask2 = maskE.reshape(E, B, 1)
    ws = list(params.weights)
    bs = [b.reshape(E, 1, -1) for b in params.biases]
    mws, mbs = list(m_state.weights), [b.reshape(E, 1, -1) for b in m_state.biases]
    vws, vbs = list(v_state.weights), [b.reshape(E, 1, -1) for b in v_state.biases]

    expert_full = lambda a: pl.BlockSpec(
        (1, *a.shape[1:]), lambda e, t: (e,) + (0,) * (a.ndim - 1),
        memory_space=pltpu.VMEM,
    )
    batch_tile = lambda width: pl.BlockSpec(
        (1, TILE, width), lambda e, t: (e, t, 0), memory_space=pltpu.VMEM
    )

    in_specs = (
        [pl.BlockSpec((E, 4), lambda e, t: (0, 0), memory_space=pltpu.SMEM)]
        + [batch_tile(x.shape[-1]), batch_tile(y.shape[-1]),
           pl.BlockSpec((1, TILE, 1), lambda e, t: (e, t, 0),
                        memory_space=pltpu.VMEM)]
        + [expert_full(a) for a in ws + bs + mws + vws + mbs + vbs]
    )
    out_shapes = (
        [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in ws + bs + mws + vws + mbs + vbs]
        + [jax.ShapeDtypeStruct((E, 1), jnp.float32)]
    )
    out_specs = (
        [expert_full(a) for a in ws + bs + mws + vws + mbs + vbs]
        + [pl.BlockSpec((E, 1), lambda e, t: (0, 0), memory_space=pltpu.SMEM)]
    )
    aliases = {4 + i: i for i in range(6 * L)}

    scratch = (
        [pltpu.VMEM(a.shape[1:], jnp.float32) for a in ws]
        + [pltpu.VMEM(b.shape[1:], jnp.float32) for b in bs]
        + [pltpu.SMEM((1, 1), jnp.float32)]
    )

    kernel = functools.partial(_kernel_experts, L, w0s, _mm_dtype(mm_dtype))
    outs = pl.pallas_call(
        kernel,
        grid=(E, n_tiles),
        in_specs=in_specs,
        out_shape=out_shapes,
        out_specs=out_specs,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20,  # whole-batch tiles; default 16M OOMs
        ),
    )(scalars, x, y, mask2, *ws, *bs, *mws, *vws, *mbs, *vbs)

    new_w = list(outs[0:L])
    new_b = [b.reshape(E, -1) for b in outs[L : 2 * L]]
    new_mw = list(outs[2 * L : 3 * L])
    new_vw = list(outs[3 * L : 4 * L])
    new_mb = [b.reshape(E, -1) for b in outs[4 * L : 5 * L]]
    new_vb = [b.reshape(E, -1) for b in outs[5 * L : 6 * L]]
    loss = outs[6 * L].reshape(E)
    return (
        SirenParams(weights=new_w, biases=new_b),
        SirenParams(weights=new_mw, biases=new_mb),
        SirenParams(weights=new_vw, biases=new_vb),
        loss,
    )


@functools.partial(
    jax.jit, static_argnames=("mspec", "dim_out", "match_kernel", "mm_dtype")
)
def reference_train_step(
    params: SirenParams,
    m_state: SirenParams,
    v_state: SirenParams,
    x: jnp.ndarray,
    y: jnp.ndarray,
    mask: jnp.ndarray,
    lr: jnp.ndarray,
    step: jnp.ndarray,
    mspec: ModelSpec,
    dim_out: int,
    match_kernel: bool = False,
    mm_dtype: str | None = None,
):
    """Pure-JAX oracle with identical SEMANTICS (for tests and fallbacks).
    Jitted: run eagerly it costs dozens of per-op remote compiles on this
    backend (docs/PERF.md "Compile budget").

    By default it uses exact `jnp.sin` and XLA autodiff — the ground truth
    the kernels are held against at trajectory tolerances.  With
    `match_kernel=True` it replays the kernels' exact numerics instead
    (shared-reduction `sincos` activations, the hand-derived backward, and
    the same `mm_dtype` casts), so mechanics tests can compare tightly.
    """
    if match_kernel:
        L = mspec.num_layers + 1
        w0s = tuple(
            [mspec.w0_initial] + [mspec.w0] * (mspec.num_layers - 1) + [0.0]
        )
        ws = list(params.weights)
        bs = [b.reshape(1, -1) for b in params.biases]
        sse, dws, dbs = _fwd_bwd(
            x, y, mask.reshape(-1, 1), ws, bs, w0s, L, _mm_dtype(mm_dtype)
        )
        inv_scale = 1.0 / (jnp.maximum(mask.sum(), 1.0) * dim_out)
        loss = sse * inv_scale
        grads = SirenParams(
            weights=[d * inv_scale for d in dws],
            biases=[d.reshape(-1) * inv_scale for d in dbs],
        )
    else:
        from lbdrn_msic_tpu.models.siren import forward

        def loss_fn(p):
            pred = forward(p, x, mspec)
            se = ((pred - y) ** 2 * mask[:, None]).sum()
            return se / (jnp.maximum(mask.sum(), 1.0) * dim_out)

        loss, grads = jax.value_and_grad(loss_fn)(params)
    t = step.astype(jnp.float32)
    c1 = 1.0 / (1.0 - ADAM_B1**t)
    c2 = 1.0 / (1.0 - ADAM_B2**t)

    new_p, new_m, new_v = [], [], []
    for w, g, m, v in zip(params.weights, grads.weights, m_state.weights, v_state.weights):
        a, b_, c = _adam(w, g, m, v, lr, c1, c2)
        new_p.append(a); new_m.append(b_); new_v.append(c)
    new_pb, new_mb, new_vb = [], [], []
    for b, g, m, v in zip(params.biases, grads.biases, m_state.biases, v_state.biases):
        a, b_, c = _adam(b, g, m, v, lr, c1, c2)
        new_pb.append(a); new_mb.append(b_); new_vb.append(c)
    return (
        SirenParams(weights=new_p, biases=new_pb),
        SirenParams(weights=new_m, biases=new_mb),
        SirenParams(weights=new_v, biases=new_vb),
        loss,
    )
