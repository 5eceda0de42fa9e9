"""End-to-end encode/decode round trips (the reference's de-facto test mode:
run.sh encodes then decodes every (image, K) and checks PSNR — SURVEY §4)."""

import numpy as np
import pytest

from lbdrn_msic_tpu.codec import decode_stream, encode_image
from lbdrn_msic_tpu.core.config import CodecConfig, FeatureSpec, ModelSpec, TrainSpec
from lbdrn_msic_tpu.eval.metrics import psnr
from lbdrn_msic_tpu.utils.synth import synth_scene

FAST_TRAIN = TrainSpec(epochs=3, batch_size=4096)


def _baseline_psnr(img, K):
    """PSNR of just dropping the LSBs (the reference's Baseline anchor,
    SOTA.py:145-146 decodes with zero LSBs)."""
    base = (img >> K) << K
    return psnr(img, base)


@pytest.mark.parametrize("K", [2, 5])
def test_roundtrip_beats_baseline(K):
    img = synth_scene(128, 128, channels=4, effective_bits=12, seed=11)
    cfg = CodecConfig(K=K, train=FAST_TRAIN)
    stream, stats = encode_image(img, cfg)
    rec, dstats = decode_stream(stream)
    assert rec.shape == img.shape and rec.dtype == np.uint16
    p = psnr(img, rec)
    pb = _baseline_psnr(img, K)
    assert p > pb + 1.0, f"LBDRN {p:.2f} dB vs baseline {pb:.2f} dB at K={K}"
    # MSB path must be perfectly preserved
    np.testing.assert_array_equal(rec >> K, img >> K)


def test_roundtrip_deterministic():
    img = synth_scene(64, 64, channels=2, seed=3)
    cfg = CodecConfig(K=4, train=TrainSpec(epochs=2, batch_size=2048))
    s1, _ = encode_image(img, cfg)
    s2, _ = encode_image(img, cfg)
    assert s1 == s2


def test_split_ratio_roundtrip():
    img = synth_scene(100, 90, channels=3, seed=5)  # non-divisible dims
    cfg = CodecConfig(K=5, split_ratio=2, train=FAST_TRAIN)
    stream, stats = encode_image(img, cfg)
    assert len(stats.tiles) == 4
    rec, dstats = decode_stream(stream)
    assert dstats.header.split_ratio == 2
    assert rec.shape == img.shape
    np.testing.assert_array_equal(rec >> 5, img >> 5)
    assert psnr(img, rec) > _baseline_psnr(img, 5)


def test_v0_header_roundtrip():
    img = synth_scene(64, 64, channels=4, seed=9)
    cfg = CodecConfig(K=5, train=TrainSpec(epochs=1, batch_size=4096))
    stream, _ = encode_image(img, cfg, header_version=0)
    rec, dstats = decode_stream(stream)
    assert dstats.header.version == 0
    np.testing.assert_array_equal(rec >> 5, img >> 5)


def test_nondefault_features_selfdescribing():
    """v1 streams carry the feature flags; decode needs no side channel."""
    img = synth_scene(64, 64, channels=2, seed=13)
    cfg = CodecConfig(
        K=3,
        features=FeatureSpec(use_coords=True, D=1),
        model=ModelSpec(base_channel=32, num_layers=1),
        train=TrainSpec(epochs=2, batch_size=2048),
    )
    stream, _ = encode_image(img, cfg)
    rec, dstats = decode_stream(stream)
    assert dstats.header.use_coords and dstats.header.D == 1
    assert dstats.header.base_channel == 32
    np.testing.assert_array_equal(rec >> 3, img >> 3)


def test_stream_sizes_accounted():
    img = synth_scene(64, 64, channels=4, seed=17)
    cfg = CodecConfig(K=5, train=TrainSpec(epochs=1, batch_size=4096))
    stream, stats = encode_image(img, cfg)
    t = stats.tiles[0]
    from lbdrn_msic_tpu.io.header import decode_header, header_size

    h = decode_header(stream)
    assert h.nn_bytes == [t.nn_bytes] and h.base_bytes == [t.base_bytes]
    assert len(stream) == header_size(stream) + t.nn_bytes + t.base_bytes


def test_corrupt_streams_fail_cleanly():
    """Truncated/garbled inputs must raise, not produce silent garbage."""
    img = synth_scene(48, 48, channels=2, seed=99)
    cfg = CodecConfig(K=4, train=TrainSpec(epochs=1, batch_size=2048))
    stream, _ = encode_image(img, cfg)

    with pytest.raises(Exception):
        decode_stream(stream[: len(stream) // 3])  # truncated mid-payload
    with pytest.raises(Exception):
        decode_stream(b"\x00" + stream[1:])  # clobbered header byte
    garbled = bytearray(stream)
    garbled[len(garbled) // 2] ^= 0xFF
    try:
        rec, _ = decode_stream(bytes(garbled))
        assert rec.shape == img.shape  # bit flips may still decode; shape must hold
    except Exception:
        pass


def test_encode_pipelined_matches_encode_image():
    """Pipelined multi-job encoding must produce byte-identical streams."""
    from lbdrn_msic_tpu.codec import encode_pipelined

    imgs = [synth_scene(48, 48, channels=2, seed=s) for s in (1, 2)]
    cfgs = [
        CodecConfig(K=4, train=TrainSpec(epochs=2, batch_size=1024)),
        CodecConfig(K=6, train=TrainSpec(epochs=2, batch_size=1024)),
    ]
    jobs = list(zip(imgs, cfgs))
    piped = encode_pipelined(jobs)
    for (img, cfg), (stream, stats) in zip(jobs, piped):
        solo, _ = encode_image(img, cfg)
        assert stream == solo
        rec, _ = decode_stream(stream)
        np.testing.assert_array_equal(rec >> cfg.K, img >> cfg.K)


@pytest.mark.parametrize("K", [3, 5, 10])  # small/medium/large bitplane counts
def test_streamed_reconstruct_matches_single_program(K):
    """Row-band streamed decode (K uint8 bitplanes fetched per band; odd W
    exercises the padded final octet) must be bit-identical to the one-shot
    path."""
    import jax
    import jax.numpy as jnp

    from lbdrn_msic_tpu.core.config import FeatureSpec, ModelSpec
    from lbdrn_msic_tpu.decode.reconstruct import reconstruct, reconstruct_streamed
    from lbdrn_msic_tpu.models.siren import init_params

    fspec, mspec = FeatureSpec(), ModelSpec(base_channel=32, num_layers=1)
    img = synth_scene(700, 97, channels=3, seed=55)  # odd W: odd pack4 count
    base = (img >> K).astype(np.uint16)
    params = init_params(jax.random.PRNGKey(1), fspec.feature_dim(3), 3, mspec)
    one = np.asarray(
        reconstruct(jnp.asarray(base), params, fspec, mspec, K, 700, 97)
    )
    streamed = reconstruct_streamed(base, params, fspec, mspec, K, n_bands=3)
    np.testing.assert_array_equal(streamed, one)


def test_encode_rate_points_expert_batched():
    """Expert-batched rate sweep: RD-equivalent to per-job encoding, valid
    streams, deterministic."""
    from lbdrn_msic_tpu.codec import encode_rate_points

    img = synth_scene(64, 64, channels=3, effective_bits=12, seed=21)
    tr = TrainSpec(epochs=3, batch_size=1024)
    cfgs = [CodecConfig(K=K, train=tr) for K in (3, 5, 7)]
    batched = encode_rate_points(img, cfgs)
    again = encode_rate_points(img, cfgs)
    for (s1, st1), (s2, _) in zip(batched, again):
        assert s1 == s2  # deterministic
    for cfg, (stream, stats) in zip(cfgs, batched):
        rec, dh = decode_stream(stream)
        assert dh.header.K == cfg.K
        np.testing.assert_array_equal(rec >> cfg.K, img >> cfg.K)
        solo, solo_stats = encode_image(img, cfg)
        rec_solo, _ = decode_stream(solo)
        pb, ps = psnr(img, rec), psnr(img, rec_solo)
        assert abs(pb - ps) < 0.5, f"K={cfg.K}: batched {pb:.2f} vs solo {ps:.2f} dB"
        assert abs(stats.tiles[0].best_mse - solo_stats.tiles[0].best_mse) < 2e-3


def test_banded_staging_roundtrip(monkeypatch):
    """When the full tap matrix exceeds the staging budget, encode_image and
    encode_rate_points must take the banded row-taps path (not the 25x-slower
    scalar-gather fallback) and still round-trip losslessly in the MSBs."""
    import lbdrn_msic_tpu.codec as codec_mod
    from lbdrn_msic_tpu.codec import encode_rate_points, pick_staging

    img = synth_scene(96, 80, channels=4, effective_bits=12, seed=33)
    tr = TrainSpec(epochs=2, batch_size=1024, sample_granule=8)
    cfg = CodecConfig(K=5, train=tr)

    # budget below the full matrix but above the banded taps for this shape
    side = 2 * cfg.features.D + 1
    full = 96 * 80 * 4 * side * side  # int8
    monkeypatch.setattr(codec_mod, "STAGE_BUDGET_BYTES", full - 1)
    staging, _ = pick_staging(96, 80, 4, int(img.max()) >> 5, cfg.features, tr)
    assert staging == "banded"

    stream, _ = encode_image(img, cfg)
    rec, _ = decode_stream(stream)
    np.testing.assert_array_equal(rec >> 5, img >> 5)
    assert psnr(img, rec) > _baseline_psnr(img, 5)

    # the expert-batched sweep must also pick banded (not silently OOM /
    # not fall back): ADVICE r1 medium finding
    results = encode_rate_points(img, [CodecConfig(K=K, train=tr) for K in (5, 6)])
    for K, (s, _) in zip((5, 6), results):
        r, dh = decode_stream(s)
        assert dh.header.K == K
        np.testing.assert_array_equal(r >> K, img >> K)


def test_banded_experts_match_full_experts():
    """fit_rate_experts banded vs full staging: identical granule grid when
    W % g == 0, so results must match bit-for-bit."""
    import jax
    import jax.numpy as jnp

    from lbdrn_msic_tpu.features.engine import row_taps_dtype, tap_matrix_dtype
    from lbdrn_msic_tpu.train.loop import fit_rate_experts

    img = synth_scene(64, 64, channels=2, effective_bits=12, seed=44)
    fspec = FeatureSpec()
    mspec = ModelSpec(base_channel=32, num_layers=1)
    tspec = TrainSpec(epochs=2, batch_size=1024, sample_granule=8)
    Ks = (4, 6)
    key = jax.random.PRNGKey(7)
    dev = jnp.asarray(img)
    mx = int(img.max())
    full = fit_rate_experts(
        dev, Ks, key, fspec, mspec, tspec, 64, 64, 2,
        tuple(jnp.dtype(tap_matrix_dtype(mx >> k, True)).name for k in Ks),
        staging="full",
    )
    banded = fit_rate_experts(
        dev, Ks, key, fspec, mspec, tspec, 64, 64, 2,
        tuple(jnp.dtype(row_taps_dtype(mx >> k)).name for k in Ks),
        staging="banded",
    )
    np.testing.assert_array_equal(
        np.asarray(full.epoch_losses), np.asarray(banded.epoch_losses)
    )
    np.testing.assert_array_equal(
        np.asarray(full.best_mse), np.asarray(banded.best_mse)
    )


def test_flagship_shapes_never_scalar_gather():
    """The real Gaofen scene shapes (BASELINE.md: GF-6 6000^2 x 8 bands,
    GF-2 ~7605x7815 x 4) must select a staged path at every rate point —
    the round-1 silent 25x scalar-gather cliff (VERDICT r1 weak #2)."""
    from lbdrn_msic_tpu.codec import pick_staging

    tr = TrainSpec(sample_granule=8)
    fspec = FeatureSpec()
    for (H, W, C) in [(6000, 6000, 8), (7815, 7605, 4), (7300, 6908, 4)]:
        for K in range(1, 12):
            max_msb = 4095 >> K  # 12-bit effective container
            staging, _ = pick_staging(H, W, C, max_msb, fspec, tr)
            assert staging in ("full", "banded"), (H, W, C, K, staging)


def test_encode_rate_points_fallback_mixed_cfgs():
    """Jobs differing beyond K fall back to the pipelined path."""
    from lbdrn_msic_tpu.codec import encode_rate_points

    img = synth_scene(48, 48, channels=2, seed=8)
    cfgs = [
        CodecConfig(K=4, train=TrainSpec(epochs=1, batch_size=1024)),
        CodecConfig(K=5, model=ModelSpec(base_channel=32, num_layers=1),
                    train=TrainSpec(epochs=1, batch_size=1024)),
    ]
    for cfg, (stream, _) in zip(cfgs, encode_rate_points(img, cfgs)):
        solo, _ = encode_image(img, cfg)
        assert stream == solo  # pipelined fallback is byte-identical


def test_decode_pipelined_matches_per_stream():
    """Cross-stream pipelined decode == per-stream decode, bit for bit,
    results in order (the sweep's decode half)."""
    from lbdrn_msic_tpu.codec import decode_pipelined

    tr = TrainSpec(epochs=2, batch_size=1024)
    imgs = [synth_scene(48, 40, channels=2, seed=s) for s in (90, 91, 92)]
    streams = [encode_image(im, CodecConfig(K=K, train=tr))[0]
               for im, K in zip(imgs, (3, 5, 4))]
    piped = decode_pipelined(streams)
    assert len(piped) == 3
    for (im, K), stream, (rec, dst) in zip(
        zip(imgs, (3, 5, 4)), streams, piped
    ):
        solo, _ = decode_stream(stream)
        np.testing.assert_array_equal(rec, solo)
        assert dst.header.K == K


def test_decode_pipelined_ahead_and_memory_gate(monkeypatch):
    """The dispatch-ahead worker (ahead > 1) and the in-flight byte gate
    must both preserve order and bit-identity to per-stream decodes."""
    import lbdrn_msic_tpu.codec as codec_mod
    from lbdrn_msic_tpu.codec import decode_pipelined_iter

    tr = TrainSpec(epochs=1, batch_size=1024)
    imgs = [synth_scene(48, 40, channels=2, seed=s) for s in range(96, 102)]
    streams = [encode_image(im, CodecConfig(K=4, train=tr))[0]
               for im in imgs]
    solos = [decode_stream(s)[0] for s in streams]
    # deep ahead: all six in flight
    out = list(decode_pipelined_iter(iter(streams), ahead=5))
    for solo, (rec, _) in zip(solos, out):
        np.testing.assert_array_equal(rec, solo)
    # byte gate: force the estimate over budget -> degrade toward serial,
    # still correct and ordered
    monkeypatch.setattr(codec_mod, "DECODE_AHEAD_BYTES", 1)
    out = list(decode_pipelined_iter(iter(streams), ahead=3))
    assert len(out) == 6
    for solo, (rec, _) in zip(solos, out):
        np.testing.assert_array_equal(rec, solo)


def test_lpc_pipelined_decode_bit_identical(monkeypatch):
    """A row-chunked LLPC v2 stream decoded through the fully-pipelined
    path (chunk decode / h2d / compute / d2h overlapped) must produce the
    BIT-IDENTICAL image the plain decode path produces."""
    from lbdrn_msic_tpu.codecs import _native

    if not _native.available():
        pytest.skip("native codec library unavailable")
    import lbdrn_msic_tpu.decode.reconstruct as rmod
    from lbdrn_msic_tpu.codec import decode_stream, encode_image

    import lbdrn_msic_tpu.utils.transfer as transfer

    # K=2 keeps the MSB 10-bit -> uint16 bands; MIN_DELTA_BYTES=0 forces
    # the delta-coded band h2d (put_image) so ITS bit-identity is covered
    monkeypatch.setattr(transfer, "MIN_DELTA_BYTES", 0)
    img = synth_scene(1800, 96, channels=2, effective_bits=12, seed=55)
    cfg = CodecConfig(
        K=2, base_codec="lpc", train=TrainSpec(epochs=1, batch_size=8192)
    )
    stream, _ = encode_image(img, cfg)
    rec_pipe, st = decode_stream(stream)
    assert "dispatch_pipelined" in (st.phases or {}), st.phases
    monkeypatch.setattr(rmod, "dispatch_streamed_lpc", lambda *a, **k: None)
    rec_plain, st2 = decode_stream(stream)
    assert "base_decode" in (st2.phases or {}), st2.phases
    np.testing.assert_array_equal(rec_pipe, rec_plain)
    np.testing.assert_array_equal(rec_pipe >> 2, img >> 2)


def test_lpc_undersized_chunks_take_plain_path(monkeypatch):
    """A v2 stream whose chunk_rows < D cannot satisfy the streamed
    decoder's halo wait (band k's bottom halo would span chunks k+2..) —
    it must take the plain path and still decode correctly (ADVICE r4
    medium)."""
    from lbdrn_msic_tpu.codecs import _native

    if not _native.available():
        pytest.skip("native codec library unavailable")
    import lbdrn_msic_tpu.codecs.base_layer as bl
    import lbdrn_msic_tpu.decode.reconstruct as rmod
    from lbdrn_msic_tpu.codec import decode_stream, encode_image
    from lbdrn_msic_tpu.core.config import FeatureSpec

    monkeypatch.setattr(bl, "LPC_CHUNK_ROWS", 1)  # < D = 2
    monkeypatch.setattr(bl, "LPC_CHUNK_MIN_H", 1)
    img = synth_scene(64, 48, channels=2, effective_bits=12, seed=77)
    cfg = CodecConfig(
        K=4, base_codec="lpc", train=TrainSpec(epochs=1, batch_size=1024)
    )
    stream, _ = encode_image(img, cfg)
    # the guard itself: undersized chunks refuse the streamed path
    # (params unused before the guard fires)
    from lbdrn_msic_tpu.io.header import decode_header, header_size

    hdr = decode_header(stream)
    ptr = header_size(stream) + hdr.nn_bytes[0]
    base_stream = stream[ptr : ptr + hdr.base_bytes[0]]
    assert (
        rmod.dispatch_streamed_lpc(
            base_stream, None, FeatureSpec(), hdr.model_spec(), 4
        )
        is None
    )
    rec, st = decode_stream(stream)
    # the streamed dispatch declined, so the plain path's phases ran
    assert "base_decode" in (st.phases or {}), st.phases
    np.testing.assert_array_equal(rec >> 4, img >> 4)


def test_encode_dataset_matches_per_job():
    """Cross-image expert batching (VERDICT r3 #2): a multi-image dataset
    encode fills the expert axis across images, and every job's stream is
    RD-equivalent to its per-job encode_image (exactly equal on CPU: the
    per-expert math is independent of the expert batch composition)."""
    from lbdrn_msic_tpu.codec import encode_dataset

    tr = TrainSpec(epochs=3, batch_size=1024)
    imgs = [
        synth_scene(48, 40, channels=2, effective_bits=12, seed=s)
        for s in (60, 61, 62)
    ]
    cfgs = [CodecConfig(K=K, train=tr) for K in (3, 5)]
    jobs = [(im, c) for im in imgs for c in cfgs]
    results = encode_dataset(jobs)
    again = encode_dataset(jobs)
    for (s1, _), (s2, _) in zip(results, again):
        assert s1 == s2  # deterministic
    for (im, cfg), (stream, stats) in zip(jobs, results):
        rec, dh = decode_stream(stream)
        assert dh.header.K == cfg.K
        np.testing.assert_array_equal(rec >> cfg.K, im >> cfg.K)
        solo, solo_stats = encode_image(im, cfg)
        rec_solo, _ = decode_stream(solo)
        pb, ps = psnr(im, rec), psnr(im, rec_solo)
        assert abs(pb - ps) < 0.5, f"K={cfg.K}: dataset {pb:.2f} vs solo {ps:.2f}"
        assert abs(stats.tiles[0].best_mse - solo_stats.tiles[0].best_mse) < 2e-3


def test_encode_dataset_groups_and_fallbacks():
    """Mixed shapes and configs: same-shape compatible jobs group, the rest
    fall back to per-job encoding; results come back in job order."""
    from lbdrn_msic_tpu.codec import encode_dataset

    tr = TrainSpec(epochs=2, batch_size=1024)
    a = synth_scene(48, 40, channels=2, effective_bits=12, seed=70)
    b = synth_scene(48, 40, channels=2, effective_bits=12, seed=71)
    odd_shape = synth_scene(32, 32, channels=2, effective_bits=12, seed=72)
    jobs = [
        (a, CodecConfig(K=4, train=tr)),
        (odd_shape, CodecConfig(K=4, train=tr)),  # unique shape -> solo
        (b, CodecConfig(K=4, train=tr)),
        (a, CodecConfig(K=5, model=ModelSpec(base_channel=32, num_layers=1),
                        train=tr)),  # incompatible model -> solo
    ]
    results = encode_dataset(jobs)
    assert len(results) == len(jobs)
    for (im, cfg), (stream, _) in zip(jobs, results):
        rec, dh = decode_stream(stream)
        assert dh.header.K == cfg.K and rec.shape == im.shape
        np.testing.assert_array_equal(rec >> cfg.K, im >> cfg.K)
    # the two solo jobs are byte-identical to encode_image
    for j in (1, 3):
        solo, _ = encode_image(jobs[j][0], jobs[j][1])
        assert results[j][0] == solo


def test_encode_dataset_explicit_key_singletons():
    """Partner-less jobs with an explicit key fold their global job index
    (matching per-job encode_image with the same fold), per the documented
    key contract."""
    import jax

    from lbdrn_msic_tpu.codec import encode_dataset

    tr = TrainSpec(epochs=1, batch_size=1024)
    a = synth_scene(40, 40, channels=2, seed=1)
    b = synth_scene(32, 32, channels=2, seed=2)  # unique shapes -> singles
    key = jax.random.PRNGKey(9)
    res = encode_dataset(
        [(a, CodecConfig(K=4, train=tr)), (b, CodecConfig(K=4, train=tr))],
        key=key,
    )
    for j, im in enumerate((a, b)):
        solo, _ = encode_image(
            im, CodecConfig(K=4, train=tr), jax.random.fold_in(key, j)
        )
        assert res[j][0] == solo


def test_encode_dataset_explicit_key_grouped_path_independent():
    """Jobs in an expert group train from the shared group fold
    (tile key fold_in(key, 0)) on EVERY execution path — including the
    one-job-per-image pipelined fallback — so a job's bytes do not depend
    on how unrelated jobs grouped (ADVICE r4)."""
    import jax

    from lbdrn_msic_tpu.codec import encode_dataset

    tr = TrainSpec(epochs=1, batch_size=1024)
    a = synth_scene(40, 40, channels=2, seed=3)
    b = synth_scene(40, 40, channels=2, seed=4)  # same shape: one group
    odd = synth_scene(32, 32, channels=2, seed=5)
    key = jax.random.PRNGKey(11)
    cfg = CodecConfig(K=4, train=tr)
    # group of two single-rate-point images -> pipelined fallback
    res = encode_dataset([(a, cfg), (b, cfg)], key=key)
    # each job uses the group key directly (tile fold applied inside),
    # exactly as encode_image(key=key) would
    for j, im in enumerate((a, b)):
        solo, _ = encode_image(im, cfg, key)
        assert res[j][0] == solo, f"job {j} diverged from the group fold"
    # path independence: an unrelated partner-less job must not change
    # the grouped jobs' bytes
    res3 = encode_dataset([(a, cfg), (odd, cfg), (b, cfg)], key=key)
    assert res3[0][0] == res[0][0]
    assert res3[2][0] == res[1][0]


def test_encode_dataset_chunking(monkeypatch):
    """A staging budget that cannot hold every expert splits the group into
    chunks; results stay RD-equivalent and ordered."""
    import lbdrn_msic_tpu.codec as codec_mod
    from lbdrn_msic_tpu.codec import encode_dataset

    tr = TrainSpec(epochs=2, batch_size=1024)
    imgs = [
        synth_scene(48, 40, channels=2, effective_bits=12, seed=s)
        for s in (80, 81)
    ]
    jobs = [
        (im, CodecConfig(K=K, train=tr)) for im in imgs for K in (3, 4)
    ]
    full_all = encode_dataset(jobs)
    side = 2 * CodecConfig().features.D + 1
    one_expert_full = 48 * 40 * 2 * side * side * 2  # int16 taps
    # group total exceeds the budget -> it halves (double-buffered chunks)
    # and splits the group into per-expert chunks
    monkeypatch.setattr(codec_mod, "STAGE_BUDGET_BYTES", 3 * one_expert_full)
    chunked = encode_dataset(jobs)
    for (s_full, _), (s_chunk, _), (im, cfg) in zip(full_all, chunked, jobs):
        rec, _ = decode_stream(s_chunk)
        np.testing.assert_array_equal(rec >> cfg.K, im >> cfg.K)
        rec_full, _ = decode_stream(s_full)
        assert abs(psnr(im, rec) - psnr(im, rec_full)) < 0.5


def test_gather_fallback_warns(monkeypatch):
    """Exceeding every staged layout's budget must WARN about the ~25x
    scalar-gather fallback, not silently crawl (VERDICT r1 weak #2)."""
    import warnings

    from lbdrn_msic_tpu import codec as codec_mod
    from lbdrn_msic_tpu.core.config import CodecConfig, TrainSpec

    img = synth_scene(64, 64, channels=2, seed=40)
    monkeypatch.setattr(codec_mod, "STAGE_BUDGET_BYTES", 1)
    cfg = CodecConfig(K=5, train=TrainSpec(epochs=1, batch_size=512))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        stream, _ = codec_mod.encode_image(img, cfg)
    assert any("scalar gathers" in str(x.message) for x in w)
    rec, _ = decode_stream(stream)
    assert np.array_equal(rec >> 5, img >> 5)
