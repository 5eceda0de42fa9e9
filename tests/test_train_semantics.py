"""Training-loop semantics: best-checkpoint cadence, LR schedule, masking."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbdrn_msic_tpu.core.config import FeatureSpec, ModelSpec, TrainSpec
from lbdrn_msic_tpu.features.engine import (
    lsb_scale,
    pad_plane,
    split_msb_lsb,
)
from lbdrn_msic_tpu.train.loop import fit, make_lr_schedule
from lbdrn_msic_tpu.utils.synth import synth_scene

FSPEC = FeatureSpec()
MSPEC = ModelSpec(base_channel=16, num_layers=1)


def _prep(hw=(40, 40), c=2, K=5, seed=0):
    img = synth_scene(*hw, channels=c, seed=seed)
    msb, lsb = split_msb_lsb(jnp.asarray(img), K)
    plane, scale = pad_plane(msb, FSPEC.D)
    return plane, scale, lsb.astype(jnp.uint16), jnp.float32(lsb_scale(K))


def test_lr_schedule_matches_steplr():
    """StepLR(step=max(1, e//3), gamma=0.1) by epoch (reference encode.py:85)."""
    ts = TrainSpec(lr=1e-3, epochs=10)
    sched = make_lr_schedule(ts, steps_per_epoch=100)
    # epochs 0-2 -> lr0; 3-5 -> lr0/10; 6-8 -> lr0/100; 9 -> lr0/1000
    assert np.isclose(float(sched(0)), 1e-3)
    assert np.isclose(float(sched(299)), 1e-3)
    assert np.isclose(float(sched(300)), 1e-4)
    assert np.isclose(float(sched(599)), 1e-4)
    assert np.isclose(float(sched(600)), 1e-5)
    assert np.isclose(float(sched(900)), 1e-6)
    # epochs=1 -> step_size=1 but only one epoch at lr0
    s1 = make_lr_schedule(TrainSpec(lr=1e-3, epochs=1), 10)
    assert np.isclose(float(s1(5)), 1e-3)


def test_lr_schedule_cosine():
    """The TPU recipe's cosine schedule: lr at step 0, ~0 at the end,
    half-way at the midpoint; and a cosine fit runs end to end."""
    ts = TrainSpec(lr=1e-3, epochs=10, schedule="cosine")
    sched = make_lr_schedule(ts, steps_per_epoch=100)
    assert np.isclose(float(sched(0)), 1e-3)
    assert np.isclose(float(sched(500)), 5e-4)
    assert float(sched(1000)) < 1e-9
    plane, scale, labels, lscale = _prep(hw=(48, 48), seed=8)
    r = fit(plane, scale, labels, lscale, jax.random.PRNGKey(0),
            FSPEC, MSPEC, TrainSpec(epochs=4, batch_size=512,
                                    schedule="cosine"), 48, 48, 2)
    losses = np.asarray(r.epoch_losses)
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_epochs1_takes_final_params():
    """With epochs == 1 the final weights are used without eval
    (reference encode.py:100-103)."""
    plane, scale, labels, lscale = _prep()
    ts = TrainSpec(epochs=1, batch_size=512)
    r = fit(plane, scale, labels, lscale, jax.random.PRNGKey(0),
            FSPEC, MSPEC, ts, 40, 40, 2)
    assert int(r.best_epoch) == 1
    for a, b in zip(r.params.weights, r.final_params.weights):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_best_epoch_tracking_strict_improvement():
    plane, scale, labels, lscale = _prep()
    ts = TrainSpec(epochs=6, batch_size=512)
    r = fit(plane, scale, labels, lscale, jax.random.PRNGKey(0),
            FSPEC, MSPEC, ts, 40, 40, 2)
    assert 1 <= int(r.best_epoch) <= 6
    assert float(r.best_mse) < 1e6
    # best params generally != final params unless last epoch was best
    assert r.step_losses.shape[0] == 6


def test_val_every_cadence():
    """val_every=3 evaluates only at epochs 3 and 6, so best_epoch must be
    one of those."""
    plane, scale, labels, lscale = _prep(seed=4)
    ts = TrainSpec(epochs=6, batch_size=512, val_every=3)
    r = fit(plane, scale, labels, lscale, jax.random.PRNGKey(1),
            FSPEC, MSPEC, ts, 40, 40, 2)
    assert int(r.best_epoch) in (3, 6)


def test_partial_batch_masking():
    """Pixel counts not divisible by the batch keep the tail batch (masked),
    like DataLoader drop_last=False."""
    plane, scale, labels, lscale = _prep(hw=(37, 31), seed=2)  # 1147 px
    ts = TrainSpec(epochs=2, batch_size=512)  # 3 steps, last has 123 px
    r = fit(plane, scale, labels, lscale, jax.random.PRNGKey(0),
            FSPEC, MSPEC, ts, 37, 31, 2)
    assert r.step_losses.shape == (2, 3)
    assert np.all(np.isfinite(np.asarray(r.step_losses)))


def test_loss_decreases():
    plane, scale, labels, lscale = _prep(hw=(64, 64), seed=5)
    ts = TrainSpec(epochs=5, batch_size=1024)
    r = fit(plane, scale, labels, lscale, jax.random.PRNGKey(0),
            FSPEC, MSPEC, ts, 64, 64, 2)
    losses = np.asarray(r.epoch_losses)
    assert losses[-1] < losses[0]


def test_dataset_mse_tap_cache_bit_identical():
    """The tap-matrix eval path == the slice path, bit for bit, for g in
    {1, 8} (W % g == 0) and both tap dtypes."""
    from lbdrn_msic_tpu.features.engine import build_tap_matrix
    from lbdrn_msic_tpu.models.siren import init_params, pad_dim
    from lbdrn_msic_tpu.train.loop import dataset_mse

    H = W = 40
    plane, scale, labels, lscale = _prep(hw=(H, W), seed=12)
    dim_in = FSPEC.feature_dim(2)
    padded_in = pad_dim(dim_in)
    params = init_params(jax.random.PRNGKey(4), dim_in, 2, MSPEC,
                         pad_input_to=padded_in)
    base = dataset_mse(params, plane, scale, labels, lscale, FSPEC, MSPEC,
                       H, W, 8, padded_in)
    for g in (1, 8):
        for dt in ("int8", "int16"):
            taps = build_tap_matrix(plane, FSPEC, H, W, jnp.dtype(dt), g=g)
            got = dataset_mse(params, plane, scale, labels, lscale, FSPEC,
                              MSPEC, H, W, 8, padded_in,
                              tap_cache=taps, tap_g=g)
            assert float(got) == float(base), (g, dt)


def test_fused_multi_step_fit_matches_xla_fit():
    """The chunked multi-step pallas path (one call per k steps, with a
    remainder chunk: 64x64 px / bs 1024 -> 4 steps/epoch, multi_k=3 ->
    one 3-step chunk + a 1-step remainder) tracks BOTH the per-step fused
    fit and the XLA fit trajectory in interpret mode."""
    from jax.experimental.pallas import tpu as pltpu

    plane, scale, labels, lscale = _prep(hw=(64, 64), seed=6)
    ts = TrainSpec(epochs=2, batch_size=1024)
    args = (plane, scale, labels, lscale, jax.random.PRNGKey(3),
            FSPEC, MSPEC, ts, 64, 64, 2)
    r_xla = fit(*args, use_fused=False)
    with pltpu.force_tpu_interpret_mode():
        r_fused = fit(*args, use_fused=True)
        r_chunk = fit(*args, use_fused=True, multi_k=3)
    np.testing.assert_allclose(
        np.asarray(r_fused.step_losses), np.asarray(r_xla.step_losses),
        rtol=1e-3,
    )
    assert r_fused.step_losses.shape == r_xla.step_losses.shape
    # chunked == per-step fused (same kernels, launch batching only)
    np.testing.assert_allclose(
        np.asarray(r_chunk.step_losses), np.asarray(r_fused.step_losses),
        rtol=1e-5,
    )
    for a, b in zip(jax.tree.leaves(r_chunk.params),
                    jax.tree.leaves(r_fused.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(r_fused.params),
                    jax.tree.leaves(r_xla.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=2e-3)


@pytest.mark.parametrize("staging", ["full", "banded"])
def test_cross_image_experts_match_per_image(staging):
    """fit_rate_experts with img_of: each (image, K) expert's trajectory
    matches the same expert trained in a single-image call — the expert
    batch composition must not leak between experts (VERDICT r3 #2)."""
    from lbdrn_msic_tpu.features.engine import row_taps_dtype, tap_matrix_dtype
    from lbdrn_msic_tpu.train.loop import fit_rate_experts

    imgs = jnp.stack([
        jnp.asarray(synth_scene(64, 64, channels=2, seed=s)) for s in (9, 10)
    ])
    ts = TrainSpec(epochs=3, batch_size=1024, sample_granule=8)
    key = jax.random.PRNGKey(1)
    mk_dt = tap_matrix_dtype if staging == "full" else row_taps_dtype

    def dts(pairs):
        return tuple(
            jnp.dtype(
                mk_dt(int(imgs[i].max()) >> K, True)
                if staging == "full"
                else mk_dt(int(imgs[i].max()) >> K)
            ).name
            for i, K in pairs
        )

    pairs = [(0, 4), (0, 6), (1, 4), (1, 6)]
    joint = fit_rate_experts(
        imgs, (4, 6, 4, 6), key, FSPEC, MSPEC, ts, 64, 64, 2, dts(pairs),
        staging=staging, img_of=(0, 0, 1, 1),
    )
    for i in (0, 1):
        solo = fit_rate_experts(
            imgs[i], (4, 6), key, FSPEC, MSPEC, ts, 64, 64, 2,
            dts([(i, 4), (i, 6)]), staging=staging,
        )
        np.testing.assert_allclose(
            np.asarray(joint.best_mse[2 * i : 2 * i + 2]),
            np.asarray(solo.best_mse), rtol=1e-5,
        )
        for a, b in zip(jax.tree.leaves(joint.params),
                        jax.tree.leaves(solo.params)):
            np.testing.assert_allclose(
                np.asarray(a)[2 * i : 2 * i + 2], np.asarray(b),
                rtol=1e-4, atol=2e-5,
            )


def test_fused_expert_multi_step_fit_matches_per_step():
    """fit_rate_experts' chunked path (multi_k) == its per-step path."""
    from jax.experimental.pallas import tpu as pltpu

    from lbdrn_msic_tpu.train.loop import fit_rate_experts

    img = jnp.asarray(synth_scene(64, 64, channels=2, seed=9))
    ts = TrainSpec(epochs=2, batch_size=1024)
    args = (img, (4, 5), jax.random.PRNGKey(1), FSPEC, MSPEC, ts,
            64, 64, 2, ("int16", "int16"))
    with pltpu.force_tpu_interpret_mode():
        r_step = fit_rate_experts(*args, use_fused=True)
        r_chunk = fit_rate_experts(*args, use_fused=True, multi_k=3)
    np.testing.assert_allclose(
        np.asarray(r_chunk.step_losses), np.asarray(r_step.step_losses),
        rtol=1e-5,
    )
    for a, b in zip(jax.tree.leaves(r_chunk.params),
                    jax.tree.leaves(r_step.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_unrolled_expert_eval_matches_batched(monkeypatch):
    """The big-scene per-expert eval (dataset_mse_experts_unrolled) must
    produce the same best-MSE/params as the batched eval — it exists only
    because the batched form faults the TPU worker at Gaofen-bucket
    shapes (r5); numerics are the same computation per expert."""
    import lbdrn_msic_tpu.train.loop as loop_mod
    from lbdrn_msic_tpu.train.loop import fit_rate_experts

    imgs = tuple(
        jnp.asarray(synth_scene(72, 56, channels=2, seed=s))
        for s in (41, 42)
    )
    ts = TrainSpec(epochs=3, batch_size=1024)
    hws = jnp.asarray([[72, 56], [70, 50], [72, 56]], jnp.int32)
    args = (imgs, (3, 5, 4), jax.random.PRNGKey(2), FSPEC, MSPEC, ts,
            72, 56, 2, ("uint16", "uint16", "uint16"))
    kw = dict(staging="banded", img_of=(0, 0, 1), hws=hws)
    batched = fit_rate_experts(*args, **kw)
    monkeypatch.setattr(loop_mod, "EVAL_UNROLL_PX", 0)
    # different static arg (multi_k is ignored at 0 vs None distinction
    # unavailable) — force a fresh trace via a distinct mm_dtype string
    unrolled = fit_rate_experts(*args, mm_dtype="float32", **kw)
    np.testing.assert_allclose(
        np.asarray(unrolled.best_mse), np.asarray(batched.best_mse),
        rtol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(unrolled.best_epoch), np.asarray(batched.best_epoch)
    )
    for a, b in zip(jax.tree.leaves(unrolled.params),
                    jax.tree.leaves(batched.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
