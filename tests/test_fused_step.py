"""Fused Pallas training-step kernel vs the pure-JAX oracle (interpret mode).

Two layers of comparison:
- MECHANICS (tight): kernel vs `reference_train_step(match_kernel=True)`,
  which replays the kernels' exact numerics (shared `_fwd_bwd`) without
  Pallas — isolates grid accumulation, blocking, aliasing, Adam wiring.
- MATH (tolerance): `_fwd_bwd`'s poly-sincos forward/hand-derived backward
  vs XLA autodiff with exact jnp.sin, compared at the GRADIENT level
  (post-Adam params amplify near-zero-gradient sign flips by 2*lr, so
  gradient tolerance is the meaningful bound).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from lbdrn_msic_tpu.core.config import ModelSpec
from lbdrn_msic_tpu.models.siren import init_params
from lbdrn_msic_tpu.ops.fused_step import (
    _fwd_bwd,
    fused_train_step,
    reference_train_step,
    sincos,
)

TILE = 1024  # forced small tile: exercises multi-tile grid accumulation


def _setup(mspec, dim_in, dim_out, B, seed=0):
    key = jax.random.PRNGKey(seed)
    params = init_params(key, dim_in, dim_out, mspec)
    zeros = jax.tree.map(jnp.zeros_like, params)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed + 1), 3)
    x = jax.random.normal(k1, (B, params.weights[0].shape[0]), jnp.float32) * 0.1
    y = jax.nn.sigmoid(jax.random.normal(k2, (B, dim_out), jnp.float32))
    mask = jnp.ones((B,), jnp.float32)
    return params, zeros, x, y, mask


@pytest.mark.parametrize(
    "bc,nl,dim_in,dim_out",
    [(64, 2, 100, 4), (32, 1, 36, 2), (128, 3, 100, 8)],
)
def test_fused_matches_reference(bc, nl, dim_in, dim_out):
    mspec = ModelSpec(base_channel=bc, num_layers=nl)
    B = 2 * TILE
    params, zeros, x, y, mask = _setup(mspec, dim_in, dim_out, B)
    lr = jnp.float32(1e-3)
    step = jnp.int32(1)

    with pltpu.force_tpu_interpret_mode():
        fp, fm, fv, floss = fused_train_step(
            params, zeros, zeros, x, y, mask, lr, step, mspec, dim_out, tile=TILE
        )
    rp, rm, rv, rloss = reference_train_step(
        params, zeros, zeros, x, y, mask, lr, step, mspec, dim_out,
        match_kernel=True,
    )
    np.testing.assert_allclose(float(floss), float(rloss), rtol=1e-5)
    for a, b in zip(fp.weights, rp.weights):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)
    for a, b in zip(fp.biases, rp.biases):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)
    for a, b in zip(fv.weights, rv.weights):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-10)


def test_fused_multi_step_trajectory():
    """Several chained steps track BOTH oracles: match_kernel tightly, and
    the exact-jnp.sin autodiff oracle at the approximation's honest bound
    (per-step losses to 2e-4; params to 2*lr per step, the worst case of a
    near-zero gradient changing sign under the poly-sincos perturbation)."""
    mspec = ModelSpec(base_channel=32, num_layers=2)
    B = TILE
    params, zeros, x, y, mask = _setup(mspec, 36, 2, B, seed=5)
    n_steps = 3
    fp = rp = kp = params
    fm = fv = rm = rv = km = kv = zeros
    lr = jnp.float32(1e-3)
    with pltpu.force_tpu_interpret_mode():
        for t in range(1, n_steps + 1):
            fp, fm, fv, fl = fused_train_step(
                fp, fm, fv, x, y, mask, lr, jnp.int32(t), mspec, 2
            )
            rp, rm, rv, rl = reference_train_step(
                rp, rm, rv, x, y, mask, lr, jnp.int32(t), mspec, 2
            )
            kp, km, kv, kl = reference_train_step(
                kp, km, kv, x, y, mask, lr, jnp.int32(t), mspec, 2,
                match_kernel=True,
            )
            np.testing.assert_allclose(float(fl), float(rl), rtol=2e-4)
            np.testing.assert_allclose(float(fl), float(kl), rtol=1e-5)
    for a, b in zip(fp.weights, kp.weights):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-6)
    for a, b in zip(fp.weights, rp.weights):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3 * n_steps
        )


def test_fused_multi_step_matches_chained_single_steps():
    """ONE k-step pallas_call == k chained fused_train_step calls, and both
    track the oracle: varying lr per step, varying masks, nonzero step0."""
    from lbdrn_msic_tpu.ops.fused_step import fused_multi_step

    mspec = ModelSpec(base_channel=32, num_layers=2)
    B, k, dim_out = TILE, 4, 2
    params, zeros, _, _, _ = _setup(mspec, 36, dim_out, B, seed=9)
    key = jax.random.PRNGKey(99)
    kx, ky = jax.random.split(key)
    X = jax.random.normal(kx, (k, B, params.weights[0].shape[0]), jnp.float32) * 0.1
    Y = jax.nn.sigmoid(jax.random.normal(ky, (k, B, dim_out), jnp.float32))
    masks = jnp.ones((k, B), jnp.float32).at[1, -17:].set(0.0)
    lrs = jnp.float32([1e-3, 1e-3, 1e-4, 1e-4])
    step0 = jnp.int32(3)  # mid-trajectory: bias correction must use 3,4,5,6

    with pltpu.force_tpu_interpret_mode():
        mp, mm, mv, mlosses = fused_multi_step(
            params, zeros, zeros, X, Y, masks, lrs, step0, mspec, dim_out
        )
        sp, sm, sv = params, zeros, zeros
        slosses = []
        for i in range(k):
            sp, sm, sv, sl = fused_train_step(
                sp, sm, sv, X[i], Y[i], masks[i], lrs[i],
                step0 + i, mspec, dim_out,
            )
            slosses.append(float(sl))
    np.testing.assert_allclose(np.asarray(mlosses), np.asarray(slosses), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(mp), jax.tree.leaves(sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-8)
    for a, b in zip(jax.tree.leaves(mv), jax.tree.leaves(sv)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-12)

    # and the oracle trajectory agrees
    rp, rm, rv = params, zeros, zeros
    for i in range(k):
        rp, rm, rv, rl = reference_train_step(
            rp, rm, rv, X[i], Y[i], masks[i], lrs[i], step0 + i, mspec, dim_out
        )
        np.testing.assert_allclose(float(mlosses[i]), float(rl), rtol=1e-4)
    for a, b in zip(mp.weights, rp.weights):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-6)


def test_sincos_accuracy():
    """The shared-reduction poly sincos vs f64 ground truth.

    Bound grows ~ulp(u) from the f32 Cody-Waite reduction; SIREN
    preactivations here are w0*z with |w0*z| rarely beyond ~1e2."""
    rng = np.random.default_rng(3)
    for bound, tol in ((3.0, 4e-7), (40.0, 4e-6), (1000.0, 1e-4)):
        u = rng.uniform(-bound, bound, 100_000).astype(np.float32)
        s, c = jax.jit(sincos)(jnp.asarray(u))
        np.testing.assert_allclose(
            np.asarray(s), np.sin(u.astype(np.float64)), atol=tol
        )
        np.testing.assert_allclose(
            np.asarray(c), np.cos(u.astype(np.float64)), atol=tol
        )


@pytest.mark.parametrize("mm_dtype,gtol", [(None, 2e-5), ("bfloat16", 2e-2)])
def test_fwd_bwd_matches_autodiff(mm_dtype, gtol):
    """_fwd_bwd (poly sincos + hand-derived backward + optional bf16
    matmuls) vs XLA autodiff of the exact forward, at the gradient level."""
    from lbdrn_msic_tpu.models.siren import forward
    from lbdrn_msic_tpu.ops.fused_step import _mm_dtype

    mspec = ModelSpec(base_channel=64, num_layers=2)
    dim_in, dim_out, B = 100, 4, 512
    params, _, x, y, mask = _setup(mspec, dim_in, dim_out, B, seed=21)
    L = mspec.num_layers + 1
    w0s = tuple([mspec.w0_initial] + [mspec.w0] * (mspec.num_layers - 1) + [0.0])

    sse, dws, dbs = _fwd_bwd(
        x, y, mask.reshape(-1, 1),
        list(params.weights), [b.reshape(1, -1) for b in params.biases],
        w0s, L, _mm_dtype(mm_dtype),
    )

    def loss_fn(p):
        pred = forward(p, x, mspec)
        return ((pred - y) ** 2 * mask[:, None]).sum()

    ref_sse, ref_grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(sse), float(ref_sse), rtol=1e-5)
    gscale = max(float(jnp.abs(g).max()) for g in jax.tree.leaves(ref_grads))
    for a, b in zip(dws, ref_grads.weights):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=gtol * gscale
        )
    for a, b in zip(dbs, ref_grads.biases):
        np.testing.assert_allclose(
            np.asarray(a).reshape(-1), np.asarray(b), atol=gtol * gscale
        )


def test_fused_bf16_matches_matched_oracle():
    """mm_dtype='bfloat16' kernel vs the oracle replaying the same casts."""
    mspec = ModelSpec(base_channel=64, num_layers=2)
    B = 2 * TILE
    params, zeros, x, y, mask = _setup(mspec, 100, 4, B, seed=31)
    lr, step = jnp.float32(1e-3), jnp.int32(1)
    with pltpu.force_tpu_interpret_mode():
        fp, fm, fv, floss = fused_train_step(
            params, zeros, zeros, x, y, mask, lr, step, mspec, 4,
            tile=TILE, mm_dtype="bfloat16",
        )
    rp, rm, rv, rloss = reference_train_step(
        params, zeros, zeros, x, y, mask, lr, step, mspec, 4,
        match_kernel=True, mm_dtype="bfloat16",
    )
    np.testing.assert_allclose(float(floss), float(rloss), rtol=1e-5)
    for a, b in zip(fp.weights, rp.weights):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


def test_fused_respects_mask():
    """Masked-out rows must not influence the update."""
    mspec = ModelSpec(base_channel=32, num_layers=1)
    B = TILE
    params, zeros, x, y, mask = _setup(mspec, 36, 2, B, seed=7)
    half = jnp.concatenate([jnp.ones(B // 2), jnp.zeros(B // 2)])
    # corrupt masked rows wildly; result must equal clean-masked run
    x_bad = x.at[B // 2 :].set(1e3)
    y_bad = y.at[B // 2 :].set(-1e3)
    with pltpu.force_tpu_interpret_mode():
        p1, _, _, l1 = fused_train_step(
            params, zeros, zeros, x, y, half, jnp.float32(1e-3), jnp.int32(1), mspec, 2
        )
        p2, _, _, l2 = fused_train_step(
            params, zeros, zeros, x_bad, y_bad, half, jnp.float32(1e-3), jnp.int32(1), mspec, 2
        )
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(p1.weights, p2.weights):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_expert_multi_step_matches_chained_expert_steps():
    """ONE (E, k) pallas_call == k chained fused_expert_step calls."""
    from lbdrn_msic_tpu.models.siren import stack_params
    from lbdrn_msic_tpu.ops.fused_step import (
        fused_expert_multi_step,
        fused_expert_step,
    )

    mspec = ModelSpec(base_channel=32, num_layers=2)
    dim_in, dim_out, B, E, k = 36, 3, TILE, 3, 4
    ps = []
    for e in range(E):
        p, zeros, _, _, _ = _setup(mspec, dim_in, dim_out, B, seed=20 + e)
        ps.append(p)
    paramsE = stack_params(ps)
    zerosE = jax.tree.map(jnp.zeros_like, paramsE)
    key = jax.random.PRNGKey(7)
    kx, ky = jax.random.split(key)
    F = paramsE.weights[0].shape[1]
    X = jax.random.normal(kx, (k, E, B, F), jnp.float32) * 0.1
    Y = jax.nn.sigmoid(jax.random.normal(ky, (k, E, B, dim_out), jnp.float32))
    masks = jnp.ones((k, B), jnp.float32).at[2, -9:].set(0.0)
    lrs = jnp.float32([1e-3, 5e-4, 5e-4, 1e-4])
    step0 = jnp.int32(2)

    with pltpu.force_tpu_interpret_mode():
        mp, mm, mv, mlosses = fused_expert_multi_step(
            paramsE, zerosE, zerosE, X, Y, masks, lrs, step0, mspec, dim_out
        )
        sp, sm, sv = paramsE, zerosE, zerosE
        slosses = []
        for i in range(k):
            sp, sm, sv, sl = fused_expert_step(
                sp, sm, sv, X[i], Y[i], masks[i], lrs[i],
                step0 + i, mspec, dim_out,
            )
            slosses.append(np.asarray(sl))
    np.testing.assert_allclose(
        np.asarray(mlosses), np.stack(slosses, axis=1), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(mp), jax.tree.leaves(sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)


def test_fused_expert_step_matches_per_expert_reference():
    """Expert-grid kernel == per-expert oracle steps (interpret mode)."""
    from lbdrn_msic_tpu.models.siren import stack_params, unstack_params
    from lbdrn_msic_tpu.ops.fused_step import fused_expert_step

    mspec = ModelSpec(base_channel=32, num_layers=2)
    dim_in, dim_out, B, E = 36, 3, TILE, 3
    ps, xs, ys = [], [], []
    for e in range(E):
        p, zeros, x, y, mask = _setup(mspec, dim_in, dim_out, B, seed=10 + e)
        ps.append(p); xs.append(x); ys.append(y)
    paramsE = stack_params(ps)
    zerosE = jax.tree.map(jnp.zeros_like, paramsE)
    xE, yE = jnp.stack(xs), jnp.stack(ys)
    mask = jnp.ones((B,), jnp.float32).at[-7:].set(0.0)
    lr, step = jnp.float32(1e-3), jnp.int32(1)

    with pltpu.force_tpu_interpret_mode():
        fp, fm, fv, floss = fused_expert_step(
            paramsE, zerosE, zerosE, xE, yE, mask, lr, step, mspec, dim_out,
            tile=TILE // 2,
        )
    for e in range(E):
        z1 = jax.tree.map(jnp.zeros_like, ps[e])
        rp, rm, rv, rloss = reference_train_step(
            ps[e], z1, z1, xs[e], ys[e], mask, lr, step, mspec, dim_out,
            match_kernel=True,
        )
        np.testing.assert_allclose(float(floss[e]), float(rloss), rtol=1e-5)
        pe = unstack_params(fp, e)
        # atol 4e-6: the two-tile grid accumulates gradients in a different
        # order than the one-shot oracle; Adam's 1/sqrt(v) amplifies the
        # few-ulp difference on near-zero gradients
        for a, b in zip(pe.weights, rp.weights):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=4e-6
            )
        for a, b in zip(pe.biases, rp.biases):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=4e-6
            )


def test_fused_expert_step_per_expert_masks():
    """Per-expert masks (the mixed-shape bucket path): each expert's step
    must equal the oracle run with ITS OWN mask — and differ from a
    uniformly-masked run."""
    from lbdrn_msic_tpu.models.siren import stack_params, unstack_params
    from lbdrn_msic_tpu.ops.fused_step import fused_expert_step

    mspec = ModelSpec(base_channel=32, num_layers=2)
    dim_in, dim_out, B, E = 36, 3, TILE, 3
    ps, xs, ys, masks = [], [], [], []
    for e in range(E):
        p, zeros, x, y, _ = _setup(mspec, dim_in, dim_out, B, seed=20 + e)
        ps.append(p); xs.append(x); ys.append(y)
        masks.append(
            jnp.ones((B,), jnp.float32).at[B - 16 * (e + 1):].set(0.0)
        )
    paramsE = stack_params(ps)
    zerosE = jax.tree.map(jnp.zeros_like, paramsE)
    xE, yE, maskE = jnp.stack(xs), jnp.stack(ys), jnp.stack(masks)
    lr, step = jnp.float32(1e-3), jnp.int32(1)

    with pltpu.force_tpu_interpret_mode():
        fp, _, _, floss = fused_expert_step(
            paramsE, zerosE, zerosE, xE, yE, maskE, lr, step, mspec, dim_out,
            tile=TILE // 2,
        )
    for e in range(E):
        z1 = jax.tree.map(jnp.zeros_like, ps[e])
        rp, _, _, rloss = reference_train_step(
            ps[e], z1, z1, xs[e], ys[e], masks[e], lr, step, mspec, dim_out,
            match_kernel=True,
        )
        np.testing.assert_allclose(float(floss[e]), float(rloss), rtol=1e-5)
        pe = unstack_params(fp, e)
        for a, b in zip(
            list(pe.weights) + list(pe.biases),
            list(rp.weights) + list(rp.biases),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=4e-6
            )
        # a WRONG (shared) mask would change the loss: guard the guard
        _, _, _, wloss = reference_train_step(
            ps[e], z1, z1, xs[e], ys[e], masks[0], lr, step, mspec, dim_out,
            match_kernel=True,
        )
        if e > 0:
            assert abs(float(wloss) - float(rloss)) > 1e-7
