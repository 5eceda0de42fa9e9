"""Feature-engine parity tests against an independent numpy oracle.

The oracle reimplements the reference's documented semantics
(reference LBDRNdataset.py:92-133): MSB/LSB split, reflect pad, max
normalization, (2D+1)^2 sliding windows in c-major/di/dj order, optional
center subtraction, optional coords + positional embedding.  The engine
works in integer tap space (`(tap-center) * (1/max)` instead of
`tap/max - center/max`), so float comparisons allow final-ULP drift.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lbdrn_msic_tpu.core.config import FeatureSpec
from lbdrn_msic_tpu.features import engine


def oracle_features_labels(img: np.ndarray, K: int, spec: FeatureSpec):
    msb = img >> K
    lsb = (img - (msb << K)).astype(np.float32) / (2**K - 1)
    C, H, W = msb.shape
    D = spec.D
    parts = []
    if spec.use_coords:
        ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        ph = 2 * ii / (H - 1) - 1
        pw = 2 * jj / (W - 1) - 1
        coords = np.stack([ph, pw], -1).astype(np.float32)
        if spec.embedding:
            freqs = spec.sigma ** np.arange(spec.n_freq) * np.pi
            s = np.sin(freqs * coords[..., None])
            c = np.cos(freqs * coords[..., None])
            coords = np.concatenate([coords[..., None], s, c], axis=-1)
        parts.append(coords.reshape(H, W, -1))
    if spec.use_colors:
        pad = np.pad(
            msb.astype(np.float32) / msb.max(), ((0, 0), (D, D), (D, D)), mode="reflect"
        ).transpose(1, 2, 0)
        win = np.lib.stride_tricks.sliding_window_view(
            pad, (2 * D + 1, 2 * D + 1), axis=(0, 1)
        )
        if spec.relative and D > 0:
            win = win - pad[D : H + D, D : W + D, :][:, :, :, None, None]
        parts.append(win.reshape(H, W, -1))
    feats = np.concatenate(parts, axis=-1).reshape(H * W, -1)
    labels = lsb.transpose(1, 2, 0).reshape(H * W, C)
    return feats.astype(np.float32), labels


def _prep(img, K, D):
    msb, lsb = engine.split_msb_lsb(jnp.asarray(img), K)
    plane, scale = engine.pad_plane(msb, D)
    labels = engine.build_label_matrix(lsb)
    return plane, scale, labels


@pytest.mark.parametrize("K", [1, 5, 8])
def test_msb_lsb_split(small_scene, K):
    msb, lsb = engine.split_msb_lsb(jnp.asarray(small_scene), K)
    np.testing.assert_array_equal(np.asarray(msb), small_scene >> K)
    want = small_scene - ((small_scene >> K) << K)
    np.testing.assert_array_equal(np.asarray(lsb), want)


@pytest.mark.parametrize(
    "spec",
    [
        FeatureSpec(),  # default: rel-colors D=2
        FeatureSpec(relative=False),
        FeatureSpec(D=0),
        FeatureSpec(D=3),
        FeatureSpec(use_coords=True),
        FeatureSpec(use_coords=True, embedding=True),
        FeatureSpec(use_coords=True, use_colors=False),
    ],
    ids=["rel-D2", "abs-D2", "D0", "D3", "coords+colors", "coords+PE", "coords-only"],
)
def test_gather_path_matches_oracle(small_scene, spec):
    K = 5
    want, want_labels = oracle_features_labels(small_scene, K, spec)
    C, H, W = small_scene.shape
    plane, scale, labels = _prep(small_scene, K, spec.D)

    rng = np.random.default_rng(0)
    idx = rng.permutation(H * W)[:500].astype(np.int32)
    got = np.asarray(engine.gather_features(plane, scale, jnp.asarray(idx), spec, H, W))
    # integer-tap arithmetic + f64 oracle embedding: allow small float drift
    atol = 5e-5 if spec.embedding else 1e-6
    np.testing.assert_allclose(got, want[idx], rtol=1e-5, atol=atol)

    got_labels = np.asarray(
        engine.gather_labels(labels, jnp.float32(engine.lsb_scale(K)), jnp.asarray(idx))
    )
    np.testing.assert_allclose(got_labels, want_labels[idx], rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize(
    "spec",
    [FeatureSpec(), FeatureSpec(use_coords=True, embedding=True)],
    ids=["rel-D2", "coords+PE"],
)
def test_slice_path_matches_oracle(small_scene, spec):
    K = 3
    want, _ = oracle_features_labels(small_scene, K, spec)
    C, H, W = small_scene.shape
    plane, scale, _ = _prep(small_scene, K, spec.D)
    R = 17
    for r0 in [0, 17, H - R]:
        got = np.asarray(
            engine.row_block_features(plane, scale, jnp.int32(r0), spec, H, W, R)
        )
        atol = 5e-5 if spec.embedding else 1e-6
        np.testing.assert_allclose(
            got, want[r0 * W : (r0 + R) * W], rtol=1e-5, atol=atol
        )


@pytest.mark.parametrize("dtype", ["int8", "int16"])
def test_staged_path_bitexact_vs_slice_and_gather(small_scene, dtype):
    """All three construction paths must produce bit-identical float32."""
    spec = FeatureSpec()
    K = 5
    C, H, W = small_scene.shape
    plane, scale, _ = _prep(small_scene, K, spec.D)
    taps = engine.build_tap_matrix(plane, spec, H, W, jnp.dtype(dtype))
    assert taps.shape == (H * W, C * 25)

    rng = np.random.default_rng(1)
    idx = jnp.asarray(rng.permutation(H * W)[:700].astype(np.int32))
    staged = np.asarray(engine.staged_features(taps, scale, idx, spec, H, W))
    gathered = np.asarray(engine.gather_features(plane, scale, idx, spec, H, W))
    np.testing.assert_array_equal(staged, gathered)

    R = 8
    r0 = 5
    sliced = np.asarray(
        engine.row_block_features(plane, scale, jnp.int32(r0), spec, H, W, R)
    )
    contiguous = jnp.arange(r0 * W, (r0 + R) * W, dtype=jnp.int32)
    staged2 = np.asarray(engine.staged_features(taps, scale, contiguous, spec, H, W))
    np.testing.assert_array_equal(sliced, staged2)


@pytest.mark.parametrize("g", [1, 8])
@pytest.mark.parametrize(
    "spec",
    [FeatureSpec(), FeatureSpec(use_coords=True),
     FeatureSpec(use_coords=True, use_colors=False)],
    ids=["rel-D2", "coords+colors", "coords-only"],
)
def test_feature_cache_bitexact_vs_slice_and_gather(small_scene, spec, g):
    """The cached-f32 path (final padded inputs, precomputed) must equal
    pad_features(slice path) and pad_features(gather path) bit-for-bit."""
    from lbdrn_msic_tpu.models.siren import pad_dim, pad_features

    K = 5
    C, H, W = small_scene.shape
    plane, scale, _ = _prep(small_scene, K, spec.D)
    padded_in = pad_dim(spec.feature_dim(C))
    cache = engine.build_feature_cache(plane, scale, spec, H, W, padded_in, g=g)
    n = H * W
    assert cache.shape == (-(-n // g) * g, padded_in)
    # trailing granule-padding rows are zero
    np.testing.assert_array_equal(np.asarray(cache[n:]), 0.0)

    rng = np.random.default_rng(2)
    idx = jnp.asarray(rng.permutation(n)[:700].astype(np.int32))
    gathered = pad_features(
        engine.gather_features(plane, scale, idx, spec, H, W), padded_in
    )
    if spec.use_coords:
        # per-pixel vs block-built coords differ by final-ULP fusion drift
        np.testing.assert_allclose(
            np.asarray(cache[idx]), np.asarray(gathered), rtol=0, atol=1e-7
        )
    else:
        np.testing.assert_array_equal(np.asarray(cache[idx]), np.asarray(gathered))

    R, r0 = 9, 13
    sliced = pad_features(
        engine.row_block_features(plane, scale, jnp.int32(r0), spec, H, W, R),
        padded_in,
    )
    got = np.asarray(cache[r0 * W : (r0 + R) * W])
    if spec.use_coords:
        # a different block height recompiles 2*ii/(H-1)-1, whose divide
        # may or may not be strength-reduced — final-ULP drift again
        np.testing.assert_allclose(got, np.asarray(sliced), rtol=0, atol=1e-7)
    else:
        np.testing.assert_array_equal(got, np.asarray(sliced))


@pytest.mark.parametrize("g", [1, 8])
@pytest.mark.parametrize(
    "spec",
    [FeatureSpec(), FeatureSpec(relative=False), FeatureSpec(use_coords=True)],
    ids=["rel-D2", "abs-D2", "coords+colors"],
)
def test_banded_path_bitexact_vs_gather(small_scene, spec, g):
    """The banded row-taps path must be bit-identical to the gather path
    for every in-image pixel, including ragged last-granule columns."""
    K = 5
    C, H, W = small_scene.shape
    plane, scale, _ = _prep(small_scene, K, spec.D)
    dt = engine.row_taps_dtype(int(small_scene.max()) >> K)
    row_taps = engine.build_row_taps(plane, spec, H, W, g, dt)
    Wg, ng_row = engine.banded_geometry(W, g)
    assert row_taps.shape == ((H + 2 * spec.D) * ng_row, g * C * (2 * spec.D + 1))

    rng = np.random.default_rng(2)
    gidx = rng.permutation(H * ng_row)[:300].astype(np.int32)
    banded = np.asarray(
        engine.banded_window_features(
            row_taps, scale, jnp.asarray(gidx), spec, H, W, g
        )
    )
    ii = gidx // ng_row
    jj = (gidx % ng_row * g)[:, None] + np.arange(g)[None, :]
    valid = (jj < W).reshape(-1)
    flat = (ii[:, None] * W + np.minimum(jj, W - 1)).reshape(-1).astype(np.int32)
    gathered = np.asarray(
        engine.gather_features(plane, scale, jnp.asarray(flat), spec, H, W)
    )
    np.testing.assert_array_equal(banded[valid], gathered[valid])


def test_banded_labels_layout(small_scene):
    K = 4
    C, H, W = small_scene.shape
    _, lsb = engine.split_msb_lsb(jnp.asarray(small_scene), K)
    g = 8
    Wg, ng_row = engine.banded_geometry(W, g)
    lb = np.asarray(engine.build_banded_labels(lsb, H, W, g))
    assert lb.shape == (H * ng_row, g * C)
    want = np.zeros((H, Wg, C), np.uint16)
    want[:, :W] = np.asarray(lsb).transpose(1, 2, 0)
    np.testing.assert_array_equal(lb, want.reshape(H * ng_row, g * C))


def test_granule_labels_and_pixel_gather(small_scene):
    """build_granule_labels groups flat g-pixel label runs; gather_pixel_labels
    reads single pixels back from the 8-granule store exactly."""
    K = 5
    C, H, W = small_scene.shape
    _, lsb = engine.split_msb_lsb(jnp.asarray(small_scene), K)
    want = np.asarray(lsb).transpose(1, 2, 0).reshape(H * W, C)

    for g in (1, 8):
        lg = np.asarray(engine.build_granule_labels(lsb, H, W, g))
        n_g = -(-H * W // g)
        assert lg.shape == (n_g, g * C)
        padded = np.zeros((n_g * g, C), np.uint16)
        padded[: H * W] = want
        np.testing.assert_array_equal(lg, padded.reshape(n_g, g * C))

    store = engine.build_granule_labels(lsb, H, W, engine.LABEL_STORE_G)
    rng = np.random.default_rng(3)
    idx = rng.permutation(H * W)[:500].astype(np.int32)
    got = np.asarray(engine.gather_pixel_labels(store, jnp.asarray(idx), C))
    np.testing.assert_array_equal(got, want[idx])


def test_tap_matrix_dtype_selection():
    assert engine.tap_matrix_dtype(127, True) == jnp.int8
    assert engine.tap_matrix_dtype(128, True) == jnp.int16
    assert engine.tap_matrix_dtype(40000, True) == jnp.int32
    assert engine.tap_matrix_dtype(255, False) == jnp.uint8
    assert engine.tap_matrix_dtype(256, False) == jnp.uint16


def test_feature_dims():
    assert FeatureSpec().feature_dim(4) == 100
    assert FeatureSpec(D=0).feature_dim(4) == 4
    assert FeatureSpec(D=1).feature_dim(4) == 36
    assert FeatureSpec(D=3).feature_dim(4) == 196
    assert FeatureSpec(use_coords=True, use_colors=False).feature_dim(4) == 2
    assert FeatureSpec(use_coords=True, embedding=True, use_colors=False).feature_dim(4) == 50
    assert FeatureSpec(use_coords=True).feature_dim(4) == 102
