"""Sharded-execution tests on the 8-device virtual CPU mesh."""

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
from lbdrn_msic_tpu.parallel.shard import fit_dp, fit_experts, make_mesh
from lbdrn_msic_tpu.train.loop import fit
from lbdrn_msic_tpu.utils.synth import synth_scene

FSPEC = FeatureSpec()
MSPEC = ModelSpec(base_channel=32, num_layers=1)
TSPEC = TrainSpec(epochs=2, batch_size=1024)


def _prep(seed=0, K=5, hw=(48, 40), c=2):
    img = synth_scene(*hw, channels=c, seed=seed)
    msb, lsb = split_msb_lsb(jnp.asarray(img), K)
    plane, scale = pad_plane(msb, FSPEC.D)
    return plane, scale, lsb.astype(jnp.uint16), jnp.float32(lsb_scale(K)), hw[0], hw[1], c


def test_mesh_shapes():
    m = make_mesh(dp=4, ep=2)
    assert m.shape == {"ep": 2, "dp": 4}
    with pytest.raises(ValueError):
        make_mesh(dp=16, ep=1)


def test_fit_dp_matches_single_device_loss():
    """DP with psum-reduced grads must track the single-device loop closely
    (identical batches, same permutations; only reduction order differs)."""
    plane, scale, labels, lscale, H, W, C = _prep()
    key = jax.random.PRNGKey(0)
    single = fit(plane, scale, labels, lscale, key, FSPEC, MSPEC, TSPEC, H, W, C)
    mesh = make_mesh(dp=4, ep=1)
    sharded = fit_dp(
        mesh, plane, scale, labels, lscale, key, FSPEC, MSPEC, TSPEC, H, W, C
    )
    np.testing.assert_allclose(
        np.asarray(sharded.epoch_losses),
        np.asarray(single.epoch_losses),
        rtol=2e-4,
    )
    assert float(sharded.best_mse) < 0.2
    for a, b in zip(sharded.params.weights, single.params.weights):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_fit_experts_shards_independent_jobs():
    """Expert fan-out: per-K networks trained in one sharded program match
    individually-trained ones."""
    K_values = [3, 5]
    img = synth_scene(48, 40, channels=2, seed=1)
    planes, scales, labels, lscales = [], [], [], []
    for K in K_values:
        msb, lsb = split_msb_lsb(jnp.asarray(img), K)
        p, s = pad_plane(msb, FSPEC.D)
        planes.append(p)
        scales.append(s)
        labels.append(lsb.astype(jnp.uint16))
        lscales.append(jnp.float32(lsb_scale(K)))
    planes = jnp.stack(planes)
    scales = jnp.stack(scales)
    labels = jnp.stack(labels)
    lscales = jnp.stack(lscales)
    keys = jax.random.split(jax.random.PRNGKey(2), len(K_values))

    mesh = make_mesh(dp=1, ep=2)
    res = fit_experts(
        mesh, planes, scales, labels, lscales, keys,
        FSPEC, MSPEC, TSPEC, 48, 40, 2,
    )
    assert res.epoch_losses.shape == (2, TSPEC.epochs)

    for e, K in enumerate(K_values):
        solo = fit(
            planes[e], scales[e], labels[e], lscales[e], keys[e],
            FSPEC, MSPEC, TSPEC, 48, 40, 2,
        )
        np.testing.assert_allclose(
            np.asarray(res.epoch_losses[e]),
            np.asarray(solo.epoch_losses),
            rtol=2e-4,
        )


def test_staged_and_gather_modes_agree():
    """The staged row-gather path and the scalar-gather fallback must produce
    identical training trajectories (identical batches, identical features)."""
    plane, scale, labels, lscale, H, W, C = _prep(seed=7)
    key = jax.random.PRNGKey(3)
    a = fit(plane, scale, labels, lscale, key, FSPEC, MSPEC, TSPEC, H, W, C,
            staging="full", tap_dtype="int16")
    b = fit(plane, scale, labels, lscale, key, FSPEC, MSPEC, TSPEC, H, W, C,
            staging="gather")
    np.testing.assert_allclose(
        np.asarray(a.epoch_losses), np.asarray(b.epoch_losses), rtol=1e-5
    )
    for wa, wb in zip(a.params.weights, b.params.weights):
        np.testing.assert_allclose(np.asarray(wa), np.asarray(wb), atol=1e-5)


@pytest.mark.parametrize("g", [1, 8])
def test_cached_matches_full_bitexact(g):
    """The cached-f32 staging mode gathers the very same f32 feature values
    the full-staged mode computes per step (colors-only spec), so the whole
    training trajectory — losses, params, best-MSE checkpoint — must match
    bit-for-bit."""
    import dataclasses

    plane, scale, labels, lscale, H, W, C = _prep(seed=21)
    ts = dataclasses.replace(TSPEC, sample_granule=g)
    key = jax.random.PRNGKey(9)
    a = fit(plane, scale, labels, lscale, key, FSPEC, MSPEC, ts, H, W, C,
            staging="full", tap_dtype="int16")
    b = fit(plane, scale, labels, lscale, key, FSPEC, MSPEC, ts, H, W, C,
            staging="cached", tap_dtype="float32")
    np.testing.assert_array_equal(
        np.asarray(a.epoch_losses), np.asarray(b.epoch_losses)
    )
    for wa, wb in zip(a.params.weights, b.params.weights):
        np.testing.assert_array_equal(np.asarray(wa), np.asarray(wb))
    np.testing.assert_array_equal(np.asarray(a.best_mse), np.asarray(b.best_mse))
    np.testing.assert_array_equal(np.asarray(a.best_epoch), np.asarray(b.best_epoch))


def test_cached_coords_only():
    """Coords-only specs can't stage taps but CAN use the final-input cache;
    the trajectory must match the scalar-gather path (ULP-tolerant: block-
    built coords differ from per-pixel coords in the last bit)."""
    import dataclasses

    fspec = dataclasses.replace(FSPEC, use_coords=True, use_colors=False)
    plane, scale, labels, lscale, H, W, C = _prep(seed=22)
    key = jax.random.PRNGKey(11)
    a = fit(plane, scale, labels, lscale, key, fspec, MSPEC, TSPEC, H, W, C,
            staging="gather")
    b = fit(plane, scale, labels, lscale, key, fspec, MSPEC, TSPEC, H, W, C,
            staging="cached", tap_dtype="float32")
    np.testing.assert_allclose(
        np.asarray(a.epoch_losses), np.asarray(b.epoch_losses), rtol=1e-4
    )
    for wa, wb in zip(a.params.weights, b.params.weights):
        np.testing.assert_allclose(np.asarray(wa), np.asarray(wb), atol=1e-4)


def test_pick_staging_prefers_cached_when_it_fits():
    from lbdrn_msic_tpu.codec import STAGE_BUDGET_BYTES, _cached_bytes, pick_staging
    from lbdrn_msic_tpu.core.config import FeatureSpec, TrainSpec

    ts = TrainSpec(sample_granule=8)
    fs = FeatureSpec()
    # bench shape: the cache fits the 8 GB budget comfortably
    assert _cached_bytes(2048, 2048, 4, fs, 8) <= STAGE_BUDGET_BYTES
    assert pick_staging(2048, 2048, 4, 127, fs, ts)[0] == "cached"
    # flagship Gaofen shapes: cache far too big, staged paths take over
    for (H, W, C) in [(6000, 6000, 8), (7815, 7605, 4)]:
        assert pick_staging(H, W, C, 127, fs, ts)[0] in ("full", "banded")
    # coords-only small tile: cache applies despite having no taps
    fs_c = FeatureSpec(use_coords=True, use_colors=False)
    assert pick_staging(64, 64, 4, 127, fs_c, ts)[0] == "cached"


def test_banded_matches_full_when_rows_divide():
    """W % g == 0 makes the banded granule grid identical to the flat one:
    the banded fit must reproduce the full-staged fit bit-for-bit (same
    permutations, same batches, bit-identical features)."""
    import dataclasses

    plane, scale, labels, lscale, H, W, C = _prep(seed=13)  # W=40, g=8 divides
    ts = dataclasses.replace(TSPEC, sample_granule=8)
    key = jax.random.PRNGKey(5)
    a = fit(plane, scale, labels, lscale, key, FSPEC, MSPEC, ts, H, W, C,
            staging="full", tap_dtype="int16")
    b = fit(plane, scale, labels, lscale, key, FSPEC, MSPEC, ts, H, W, C,
            staging="banded", tap_dtype="uint16")
    np.testing.assert_array_equal(
        np.asarray(a.epoch_losses), np.asarray(b.epoch_losses)
    )
    for wa, wb in zip(a.params.weights, b.params.weights):
        np.testing.assert_array_equal(np.asarray(wa), np.asarray(wb))
    np.testing.assert_array_equal(
        np.asarray(a.best_mse), np.asarray(b.best_mse)
    )


def test_banded_with_ragged_rows():
    """W % g != 0: the banded grid pads each row to a granule multiple and
    masks the padding; training must stay finite and converge like g=1."""
    import dataclasses

    img = synth_scene(50, 42, channels=2, seed=21)  # W=42, g=8 -> ragged
    msb, lsb = split_msb_lsb(jnp.asarray(img), 5)
    plane, scale = pad_plane(msb, FSPEC.D)
    labels = lsb.astype(jnp.uint16)
    lscale = jnp.float32(lsb_scale(5))
    ts = TrainSpec(epochs=4, batch_size=1024, sample_granule=8)
    ts1 = TrainSpec(epochs=4, batch_size=1024)
    key = jax.random.PRNGKey(17)
    rb = fit(plane, scale, labels, lscale, key, FSPEC, MSPEC, ts, 50, 42, 2,
             staging="banded", tap_dtype="uint16")
    r1 = fit(plane, scale, labels, lscale, key, FSPEC, MSPEC, ts1, 50, 42, 2)
    mb, m1 = float(rb.best_mse), float(r1.best_mse)
    assert np.isfinite(mb)
    # band justified by the full-sweep g=8-vs-g=1 BD delta (VALIDATION.md);
    # see test_sample_granule_mode
    assert abs(mb - m1) < 0.10 * m1, (m1, mb)


def test_encode_image_mesh_dp_roundtrip():
    """Codec-level mesh wiring: encode_image(mesh=dp4) trains data-parallel
    and the stream round-trips; RD-equivalent to the single-device stream."""
    from lbdrn_msic_tpu.codec import decode_stream, encode_image
    from lbdrn_msic_tpu.core.config import CodecConfig
    from lbdrn_msic_tpu.eval.metrics import psnr

    img = synth_scene(64, 64, channels=2, seed=31)
    cfg = CodecConfig(K=5, train=TrainSpec(epochs=2, batch_size=1024))
    mesh = make_mesh(dp=4)
    stream, stats = encode_image(img, cfg, mesh=mesh)
    rec, _ = decode_stream(stream)
    np.testing.assert_array_equal(rec >> 5, img >> 5)
    solo, _ = encode_image(img, cfg)
    rec_solo, _ = decode_stream(solo)
    assert abs(psnr(img, rec) - psnr(img, rec_solo)) < 0.5


def test_decode_stream_mesh_sp_bitexact():
    """decode_stream(mesh=dp4) row-shards reconstruction with a halo
    exchange; output must be bit-identical to the single-device decode."""
    from lbdrn_msic_tpu.codec import decode_stream, encode_image
    from lbdrn_msic_tpu.core.config import CodecConfig

    img = synth_scene(64, 48, channels=3, seed=37)
    cfg = CodecConfig(K=4, train=TrainSpec(epochs=1, batch_size=1024))
    stream, _ = encode_image(img, cfg)
    rec, _ = decode_stream(stream)
    rec_sp, _ = decode_stream(stream, mesh=make_mesh(dp=4))
    np.testing.assert_array_equal(rec_sp, rec)


def test_encode_rate_points_mesh_ep():
    """encode_rate_points(mesh=ep) fans K-rate experts across devices; E not
    divisible by the axis exercises the padding path."""
    from lbdrn_msic_tpu.codec import decode_stream, encode_image, encode_rate_points
    from lbdrn_msic_tpu.core.config import CodecConfig
    from lbdrn_msic_tpu.eval.metrics import psnr

    img = synth_scene(48, 48, channels=2, seed=41)
    tr = TrainSpec(epochs=2, batch_size=1024)
    cfgs = [CodecConfig(K=K, train=tr) for K in (3, 5, 7)]  # 3 experts, ep=2
    mesh = make_mesh(dp=1, ep=2)
    results = encode_rate_points(img, cfgs, mesh=mesh)
    for cfg, (stream, _) in zip(cfgs, results):
        rec, dh = decode_stream(stream)
        assert dh.header.K == cfg.K
        np.testing.assert_array_equal(rec >> cfg.K, img >> cfg.K)
        solo, _ = encode_image(img, cfg)
        rec_solo, _ = decode_stream(solo)
        assert abs(psnr(img, rec) - psnr(img, rec_solo)) < 0.5, cfg.K


def test_expert_layout_no_padding_waste():
    """E experts on a wider ep axis must right-size the submesh, not train
    duplicates: E<=ep gives ZERO padded experts, and residual padding is
    always < the submesh width (VERDICT r3 #5)."""
    from lbdrn_msic_tpu.codec import _expert_layout

    assert _expert_layout(3, 8) == (1, 3, 3)  # the verdict's example
    assert _expert_layout(8, 8) == (1, 8, 8)
    assert _expert_layout(9, 8) == (2, 5, 10)  # 1 duplicate, 2 rounds
    assert _expert_layout(11, 8) == (2, 6, 12)
    for E in range(1, 30):
        for ep in range(1, 9):
            rounds, ep_eff, Epad = _expert_layout(E, ep)
            assert Epad >= E and ep_eff <= ep
            assert rounds == -(-E // ep)  # never more rounds than needed
            assert Epad - E < ep_eff  # bounded duplicate padding
            if E <= ep:
                assert Epad == E  # zero waste in the common sweep case


def test_encode_rate_points_mesh_submesh():
    """E=3 on ep=8: the right-sized submesh path must still produce correct,
    RD-equivalent streams (companion to test_expert_layout_no_padding_waste;
    the 3 experts land on 3 of the 8 devices)."""
    from lbdrn_msic_tpu.codec import decode_stream, encode_rate_points
    from lbdrn_msic_tpu.core.config import CodecConfig

    img = synth_scene(48, 48, channels=2, seed=43)
    tr = TrainSpec(epochs=2, batch_size=1024)
    cfgs = [CodecConfig(K=K, train=tr) for K in (3, 5, 7)]
    results = encode_rate_points(img, cfgs, mesh=make_mesh(dp=1, ep=8))
    for cfg, (stream, st) in zip(cfgs, results):
        rec, dh = decode_stream(stream)
        assert dh.header.K == cfg.K
        np.testing.assert_array_equal(rec >> cfg.K, img >> cfg.K)


def test_encode_dataset_mesh_cross_image():
    """encode_dataset(mesh=ep): (image, K) jobs of one shape fan out across
    devices as experts — cross-image EP (VERDICT r3 #2 over the mesh)."""
    from lbdrn_msic_tpu.codec import decode_stream, encode_dataset, encode_image
    from lbdrn_msic_tpu.core.config import CodecConfig
    from lbdrn_msic_tpu.eval.metrics import psnr

    tr = TrainSpec(epochs=2, batch_size=1024)
    imgs = [synth_scene(48, 48, channels=2, seed=s) for s in (45, 46)]
    jobs = [(im, CodecConfig(K=K, train=tr)) for im in imgs for K in (3, 5)]
    results = encode_dataset(jobs, mesh=make_mesh(dp=1, ep=4))
    for (im, cfg), (stream, _) in zip(jobs, results):
        rec, dh = decode_stream(stream)
        assert dh.header.K == cfg.K
        np.testing.assert_array_equal(rec >> cfg.K, im >> cfg.K)
        solo, _ = decode_stream(encode_image(im, cfg)[0])
        assert abs(psnr(im, rec) - psnr(im, solo)) < 0.5


def test_encode_dataset_mesh_bucketed_mixed_shapes():
    """encode_dataset(mesh=ep, bucket=True): images of DIFFERENT shapes in
    one bucket fan out as experts over the mesh with per-expert pad masks
    (fit_experts hws); streams decode at their actual shapes."""
    from lbdrn_msic_tpu.codec import decode_stream, encode_dataset, encode_image
    from lbdrn_msic_tpu.core.config import CodecConfig
    from lbdrn_msic_tpu.eval.metrics import psnr

    tr = TrainSpec(epochs=2, batch_size=1024)
    a = synth_scene(100, 90, channels=2, effective_bits=12, seed=47)
    b = synth_scene(120, 128, channels=2, effective_bits=12, seed=48)
    jobs = [(im, CodecConfig(K=K, train=tr)) for im in (a, b) for K in (3, 5)]
    results = encode_dataset(jobs, mesh=make_mesh(dp=1, ep=4), bucket=True)
    for (im, cfg), (stream, _) in zip(jobs, results):
        rec, dh = decode_stream(stream)
        assert rec.shape == im.shape
        assert (dh.header.height, dh.header.width) == im.shape[1:]
        np.testing.assert_array_equal(rec >> cfg.K, im >> cfg.K)
        solo, _ = decode_stream(encode_image(im, cfg, bucket=True)[0])
        assert abs(psnr(im, rec) - psnr(im, solo)) < 0.5


def test_sample_granule_mode():
    """Granule sampling (g>1) must train to a similar optimum as g=1 and
    handle non-divisible pixel counts via masking."""
    import dataclasses

    img = synth_scene(50, 42, channels=2, seed=9)  # 2100 px, not / 8
    msb, lsb = split_msb_lsb(jnp.asarray(img), 5)
    plane, scale = pad_plane(msb, FSPEC.D)
    labels = lsb.astype(jnp.uint16)
    lscale = jnp.float32(lsb_scale(5))
    ts1 = TrainSpec(epochs=4, batch_size=1024)
    ts8 = dataclasses.replace(ts1, sample_granule=8)
    key = jax.random.PRNGKey(11)
    r1 = fit(plane, scale, labels, lscale, key, FSPEC, MSPEC, ts1, 50, 42, 2)
    r8 = fit(plane, scale, labels, lscale, key, FSPEC, MSPEC, ts8, 50, 42, 2)
    m1, m8 = float(r1.best_mse), float(r8.best_mse)
    assert np.isfinite(m8)
    # Converged-quality equivalence measured at full scale: a complete RD
    # sweep at g=8 vs g=1 lands within +0.0063 % BD-Rate / -0.0013 dB
    # (validation/VALIDATION.md "sample_granule quantified").  This
    # tiny-scene smoke keeps a 10 % MSE band — 4 epochs on 2100 px is
    # noisier than the 10-epoch 512^2 validation runs, and MSE is
    # quadratic in the ~0.001 dB PSNR delta measured there.
    assert abs(m8 - m1) < 0.10 * m1, (m1, m8)
