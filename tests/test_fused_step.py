"""Fused Pallas training-step kernel vs the pure-JAX oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from lbdrn_msic_tpu.core.config import ModelSpec
from lbdrn_msic_tpu.models.siren import init_params
from lbdrn_msic_tpu.ops.fused_step import (
    fused_train_step,
    reference_train_step,
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
        params, zeros, zeros, x, y, mask, lr, step, mspec, dim_out
    )
    np.testing.assert_allclose(float(floss), float(rloss), rtol=1e-5)
    for a, b in zip(fp.weights, rp.weights):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)
    for a, b in zip(fp.biases, rp.biases):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)
    for a, b in zip(fv.weights, rv.weights):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-10)


def test_fused_multi_step_trajectory():
    """Several chained steps stay numerically close to the oracle."""
    mspec = ModelSpec(base_channel=32, num_layers=2)
    B = TILE
    params, zeros, x, y, mask = _setup(mspec, 36, 2, B, seed=5)
    fp = rp = params
    fm = fv = rm = rv = zeros
    lr = jnp.float32(1e-3)
    with pltpu.force_tpu_interpret_mode():
        for t in range(1, 4):
            fp, fm, fv, fl = fused_train_step(
                fp, fm, fv, x, y, mask, lr, jnp.int32(t), mspec, 2
            )
            rp, rm, rv, rl = reference_train_step(
                rp, rm, rv, x, y, mask, lr, jnp.int32(t), mspec, 2
            )
            np.testing.assert_allclose(float(fl), float(rl), rtol=1e-4)
    for a, b in zip(fp.weights, rp.weights):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-6)


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
            ps[e], z1, z1, xs[e], ys[e], mask, lr, step, mspec, dim_out
        )
        np.testing.assert_allclose(float(floss[e]), float(rloss), rtol=1e-5)
        pe = unstack_params(fp, e)
        for a, b in zip(pe.weights, rp.weights):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
            )
        for a, b in zip(pe.biases, rp.biases):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
            )
