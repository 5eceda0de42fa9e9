"""Shape-bucketed training (VERDICT r3 #1): heterogeneous shapes reuse
O(buckets) compiled programs, with the pad masked out of every batch and
eval so results stay RD-equivalent to exact-shape fits."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lbdrn_msic_tpu.codec import (
    bucket_dims,
    _pad_to_bucket,
    decode_stream,
    encode_image,
)
from lbdrn_msic_tpu.core.config import CodecConfig, FeatureSpec, TrainSpec
from lbdrn_msic_tpu.eval.metrics import psnr
from lbdrn_msic_tpu.features.engine import (
    lsb_scale,
    pad_plane,
    split_msb_lsb,
)
from lbdrn_msic_tpu.train.loop import fit
from lbdrn_msic_tpu.utils.compile_log import CompileLog
from lbdrn_msic_tpu.utils.synth import synth_scene

FSPEC = FeatureSpec()


def test_bucket_dims():
    # the reference Gaofen shapes collapse (SURVEY §6): both GF-2 widths
    # share one bucket, so 3 distinct flagship fits drop to 2
    assert bucket_dims(7340, 7815) == bucket_dims(7605, 7815) == (7680, 8192)
    assert bucket_dims(6000, 6000) == (6144, 6144)
    # small images use the fine quantum; aligned shapes are identity
    assert bucket_dims(2048, 2048) == (2048, 2048)
    assert bucket_dims(90, 100) == bucket_dims(120, 110) == (128, 128)
    # a too-thin pad steps up so edge windows keep exact reflect parity
    assert bucket_dims(127, 127, D=2) == (256, 256)
    assert bucket_dims(127, 127, D=0) == (128, 128)
    assert bucket_dims(128, 128, D=2) == (128, 128)  # exact: no pad needed


def test_pad_to_bucket_reflects_like_pad_plane():
    """The host bucket pad + device reflect pad must give every VALID
    pixel's window exactly the values actual-shape processing gives it."""
    img = synth_scene(90, 100, channels=2, seed=3)
    D = FSPEC.D
    Hb, Wb = bucket_dims(90, 100, D)
    padded = _pad_to_bucket(img, D, Hb, Wb)
    assert padded.shape == (2, Hb, Wb)
    np.testing.assert_array_equal(padded[:, :90, :100], img)
    assert padded.max() == img.max()  # plane_scale unchanged

    # windows: plane of the bucket image vs plane of the actual image must
    # agree on every row/col a valid pixel can read (up to actual+D)
    K = 5
    msb_a, _ = split_msb_lsb(jnp.asarray(img), K)
    plane_a, scale_a = pad_plane(msb_a, D)
    msb_b, _ = split_msb_lsb(jnp.asarray(padded), K)
    plane_b, scale_b = pad_plane(msb_b, D)
    np.testing.assert_array_equal(
        np.asarray(plane_a), np.asarray(plane_b)[:, : 90 + 2 * D, : 100 + 2 * D]
    )
    assert float(scale_a) == float(scale_b)


def _fit_mse(img, K, tspec, staging, tap_dtype, bucket):
    C, H, W = img.shape
    key = jax.random.PRNGKey(7)
    if bucket:
        Hb, Wb = bucket_dims(H, W, FSPEC.D)
        padded = _pad_to_bucket(img, FSPEC.D, Hb, Wb)
        msb, lsb = split_msb_lsb(jnp.asarray(padded), K)
        hw = jnp.asarray([H, W], jnp.int32)
        H, W = Hb, Wb
    else:
        msb, lsb = split_msb_lsb(jnp.asarray(img), K)
        hw = None
    plane, scale = pad_plane(msb, FSPEC.D)
    res = fit(
        plane, scale, lsb.astype(jnp.uint16), jnp.float32(lsb_scale(K)),
        key, FSPEC, CodecConfig().model, tspec, H, W, C,
        staging=staging, tap_dtype=tap_dtype, hw=hw,
    )
    return float(res.best_mse)


def test_bucketed_fit_rd_equivalent_all_stagings():
    """Bucketed fits (pad masked) must converge to ~the exact-shape
    optimum on every staging path."""
    img = synth_scene(90, 100, channels=2, seed=5)
    tspec = TrainSpec(epochs=4, batch_size=2048)
    for staging, dt in [("full", "int16"), ("banded", "uint16"),
                        ("cached", "float32"), ("gather", "int16")]:
        exact = _fit_mse(img, 5, tspec, staging, dt, bucket=False)
        bucketed = _fit_mse(img, 5, tspec, staging, dt, bucket=True)
        assert abs(bucketed - exact) < 0.3 * exact + 1e-4, (
            staging, exact, bucketed,
        )


def test_bucketed_fit_granule_sampling():
    img = synth_scene(90, 100, channels=2, seed=6)
    tspec = TrainSpec(epochs=4, batch_size=2048, sample_granule=8)
    for staging, dt in [("full", "int16"), ("banded", "uint16"),
                        ("cached", "float32")]:
        exact = _fit_mse(img, 5, tspec, staging, dt, bucket=False)
        bucketed = _fit_mse(img, 5, tspec, staging, dt, bucket=True)
        assert abs(bucketed - exact) < 0.3 * exact + 1e-4, (
            staging, exact, bucketed,
        )


def test_two_shapes_share_one_compiled_fit():
    """THE compile-count probe (VERDICT r3 #1 'Done' criterion): two
    different-sized images encoded with bucket=True hit the SAME compiled
    fit program — the second image compiles nothing new."""
    tspec = TrainSpec(epochs=2, batch_size=2048)
    cfg = CodecConfig(K=5, train=tspec)
    img_a = synth_scene(90, 100, channels=2, seed=11)
    img_b = synth_scene(120, 110, channels=2, seed=12)

    with CompileLog() as cl:
        stream_a, _ = encode_image(img_a, cfg, bucket=True)
    first = dict(cl.counts())
    assert first.get("fit", 0) == 1

    with CompileLog() as cl2:
        stream_b, _ = encode_image(img_b, cfg, bucket=True)
    assert cl2.counts().get("fit", 0) == 0, (
        "second shape recompiled the fit despite sharing the bucket: "
        f"{cl2.counts()}"
    )

    # and the streams still decode correctly at their ACTUAL shapes
    for img, stream in [(img_a, stream_a), (img_b, stream_b)]:
        rec, dh = decode_stream(stream)
        assert rec.shape == img.shape
        np.testing.assert_array_equal(rec >> 5, img >> 5)
        assert psnr(img, rec) > 45


def test_bucketed_dataset_mixed_shapes_one_batch():
    """encode_dataset(bucket=True): images of DIFFERENT shapes sharing one
    bucket train as one cross-image expert batch (per-expert pad masks,
    fit_rate_experts hws) and each job matches its per-job BUCKETED
    encode_image exactly on CPU."""
    from lbdrn_msic_tpu.codec import encode_dataset

    tr = TrainSpec(epochs=3, batch_size=1024)
    a = synth_scene(100, 90, channels=2, effective_bits=12, seed=21)
    b = synth_scene(120, 128, channels=2, effective_bits=12, seed=22)
    jobs = [(im, CodecConfig(K=K, train=tr)) for im in (a, b) for K in (3, 5)]

    with CompileLog() as cl:
        results = encode_dataset(jobs, bucket=True)
    # one bucket group, one chunk -> ONE expert-fit compile for two shapes
    assert cl.counts().get("fit_rate_experts", 0) == 1, cl.counts()
    for (im, cfg), (stream, stats) in zip(jobs, results):
        rec, dh = decode_stream(stream)
        assert rec.shape == im.shape
        assert (dh.header.height, dh.header.width) == im.shape[1:]
        np.testing.assert_array_equal(rec >> cfg.K, im >> cfg.K)
        solo, solo_stats = encode_image(im, cfg, bucket=True)
        rec_solo, _ = decode_stream(solo)
        assert abs(psnr(im, rec) - psnr(im, rec_solo)) < 0.3
        assert abs(
            stats.tiles[0].best_mse - solo_stats.tiles[0].best_mse
        ) < 2e-3


def test_bucketed_dataset_unbucketed_grouping_unchanged():
    """bucket=False keeps exact-shape grouping: different shapes never
    share an expert batch."""
    from lbdrn_msic_tpu.codec import encode_dataset

    tr = TrainSpec(epochs=2, batch_size=1024)
    a = synth_scene(100, 90, channels=2, seed=23)
    b = synth_scene(120, 128, channels=2, seed=24)
    jobs = [(a, CodecConfig(K=4, train=tr)), (b, CodecConfig(K=4, train=tr))]
    results = encode_dataset(jobs)  # two singleton groups -> encode_image
    for (im, cfg), (stream, _) in zip(jobs, results):
        solo, _ = encode_image(im, cfg)
        assert stream == solo


def test_bucketed_encode_rd_close_to_exact():
    """encode_image(bucket=True) lands ~the same RD point as exact."""
    img = synth_scene(90, 100, channels=2, seed=13)
    cfg = CodecConfig(K=5, train=TrainSpec(epochs=3, batch_size=2048))
    se, _ = encode_image(img, cfg)
    sb, stb = encode_image(img, cfg, bucket=True)
    re_, _ = decode_stream(se)
    rb, _ = decode_stream(sb)
    assert abs(psnr(img, re_) - psnr(img, rb)) < 1.0
    # nn payload identical size; stream sizes match (same header/base)
    assert abs(len(sb) - len(se)) < 64


def test_bucket_noop_for_aligned_shapes():
    """An already-aligned shape must encode byte-identically with and
    without bucket=True (bucketing is the identity there)."""
    img = synth_scene(128, 128, channels=2, seed=14)
    cfg = CodecConfig(K=5, train=TrainSpec(epochs=2, batch_size=2048))
    s0, _ = encode_image(img, cfg)
    s1, _ = encode_image(img, cfg, bucket=True)
    assert s0 == s1


def test_bucket_skipped_for_coords_features():
    """Coord features normalize by the static shape, so bucketing must
    fall back to exact-shape training (still correct) — and say so with
    a RuntimeWarning instead of degrading silently (VERDICT r4 weak #5)."""
    import warnings

    fs = dataclasses.replace(FSPEC, use_coords=True)
    img = synth_scene(90, 100, channels=2, seed=15)
    cfg = CodecConfig(
        K=5, features=fs, train=TrainSpec(epochs=2, batch_size=2048)
    )
    s0, _ = encode_image(img, cfg)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        s1, _ = encode_image(img, cfg, bucket=True)
    assert any(
        issubclass(w.category, RuntimeWarning)
        and "bucket=True requested" in str(w.message)
        for w in caught
    )
    assert s0 == s1  # identical: bucket was a no-op


def test_bucket_applied_quietly_for_colors_features():
    """The default colors family must bucket WITHOUT the downgrade
    warning (the warning is for gated-off configs only)."""
    import warnings

    img = synth_scene(90, 100, channels=2, seed=15)
    cfg = CodecConfig(K=5, train=TrainSpec(epochs=2, batch_size=2048))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        encode_image(img, cfg, bucket=True)
    assert not any(
        "bucket=True requested" in str(w.message) for w in caught
    )
