"""Feature-engine parity tests against an independent numpy oracle.

The oracle reimplements the reference's documented semantics
(reference LBDRNdataset.py:92-133): MSB/LSB split, reflect pad, max
normalization, (2D+1)^2 sliding windows in c-major/di/dj order, optional
center subtraction, optional coords + positional embedding.
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


@pytest.mark.parametrize("K", [1, 5, 8])
def test_msb_lsb_split(small_scene, K):
    msb, lsb = engine.split_msb_lsb(jnp.asarray(small_scene), K)
    np.testing.assert_array_equal(np.asarray(msb), small_scene >> K)
    want = (small_scene - ((small_scene >> K) << K)).astype(np.float32) / (2**K - 1)
    np.testing.assert_allclose(np.asarray(lsb), want, rtol=1e-6)


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
    msb, lsb = engine.split_msb_lsb(jnp.asarray(small_scene), K)
    plane = engine.pad_plane(msb, spec.D)

    rng = np.random.default_rng(0)
    idx = rng.permutation(H * W)[:500].astype(np.int32)
    got = np.asarray(engine.gather_features(plane, jnp.asarray(idx), spec, H, W))
    # the reference evaluates the positional embedding's sin/cos in float64
    # (numpy upcasting); the device path is float32 — tolerate that drift
    atol = 5e-5 if spec.embedding else 1e-6
    np.testing.assert_allclose(got, want[idx], rtol=1e-5, atol=atol)

    got_labels = np.asarray(engine.gather_labels(lsb, jnp.asarray(idx)))
    np.testing.assert_allclose(got_labels, want_labels[idx], rtol=1e-6)


@pytest.mark.parametrize(
    "spec",
    [FeatureSpec(), FeatureSpec(use_coords=True, embedding=True)],
    ids=["rel-D2", "coords+PE"],
)
def test_slice_path_matches_oracle(small_scene, spec):
    K = 3
    want, _ = oracle_features_labels(small_scene, K, spec)
    C, H, W = small_scene.shape
    msb, _ = engine.split_msb_lsb(jnp.asarray(small_scene), K)
    plane = engine.pad_plane(msb, spec.D)
    R = 17
    for r0 in [0, 17, H - R]:
        got = np.asarray(
            engine.row_block_features(plane, jnp.int32(r0), spec, H, W, R)
        )
        atol = 5e-5 if spec.embedding else 1e-6
        np.testing.assert_allclose(
            got, want[r0 * W : (r0 + R) * W], rtol=1e-5, atol=atol
        )


def test_slice_and_gather_paths_agree_exactly(small_scene):
    """The two construction paths must be bit-identical (training vs eval)."""
    spec = FeatureSpec()
    K = 5
    C, H, W = small_scene.shape
    msb, _ = engine.split_msb_lsb(jnp.asarray(small_scene), K)
    plane = engine.pad_plane(msb, spec.D)
    R = 8
    r0 = 11
    sliced = np.asarray(engine.row_block_features(plane, jnp.int32(r0), spec, H, W, R))
    idx = np.arange(r0 * W, (r0 + R) * W, dtype=np.int32)
    gathered = np.asarray(engine.gather_features(plane, jnp.asarray(idx), spec, H, W))
    np.testing.assert_array_equal(sliced, gathered)


def test_feature_dims():
    assert FeatureSpec().feature_dim(4) == 100
    assert FeatureSpec(D=0).feature_dim(4) == 4
    assert FeatureSpec(D=1).feature_dim(4) == 36
    assert FeatureSpec(D=3).feature_dim(4) == 196
    assert FeatureSpec(use_coords=True, use_colors=False).feature_dim(4) == 2
    assert FeatureSpec(use_coords=True, embedding=True, use_colors=False).feature_dim(4) == 50
    assert FeatureSpec(use_coords=True).feature_dim(4) == 102
