"""SIREN model tests (semantics per reference LBDRNmodel.py:7-82)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbdrn_msic_tpu.core.config import ModelSpec
from lbdrn_msic_tpu.models import siren


@pytest.mark.parametrize(
    "bc,nl,expected",
    [(64, 2, 10884), (128, 1, 13444), (128, 2, 29956), (256, 2, 92676)],
)
def test_param_counts_match_reference(bc, nl, expected):
    """Model sizes published at reference BD_metrics.py:221 (D=2, C=4 -> dim_in=100)."""
    spec = ModelSpec(base_channel=bc, num_layers=nl)
    assert spec.param_count(100, 4) == expected


def test_init_scheme():
    spec = ModelSpec(base_channel=64, num_layers=2)
    p = siren.init_params(jax.random.PRNGKey(0), 100, 4, spec)
    # first layer: U(-1/dim_in, 1/dim_in), padded to 128 rows
    w0 = np.asarray(p.weights[0])
    assert w0.shape == (128, 64)
    assert np.abs(w0[:100]).max() <= 1 / 100
    assert np.all(w0[100:] == 0)
    # hidden: U(-sqrt(6/64)/30, ...)
    s = np.sqrt(6 / 64) / 30
    w1 = np.asarray(p.weights[1])
    assert np.abs(w1).max() <= s
    assert np.abs(w1).max() > s * 0.8  # actually fills the range
    # final layer bound uses dim_in=64 as well
    w2 = np.asarray(p.weights[2])
    assert w2.shape == (64, 4)
    assert np.abs(w2).max() <= s


def test_forward_matches_numpy_oracle():
    spec = ModelSpec(base_channel=8, num_layers=2)
    p = siren.init_params(jax.random.PRNGKey(1), 5, 3, spec, pad_input_to=128)
    x = np.random.default_rng(0).standard_normal((17, 5)).astype(np.float32)
    xp = siren.pad_features(jnp.asarray(x), 128)
    got = np.asarray(siren.forward(p, xp, spec))

    h = x
    for i in range(2):
        w = np.asarray(p.weights[i])[: h.shape[1]]
        h = np.sin(30.0 * (h @ w + np.asarray(p.biases[i])))
    z = h @ np.asarray(p.weights[2]) + np.asarray(p.biases[2])
    want = 1 / (1 + np.exp(-z))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_padding_does_not_change_output():
    spec = ModelSpec(base_channel=16, num_layers=1)
    key = jax.random.PRNGKey(3)
    p_pad = siren.init_params(key, 10, 2, spec, pad_input_to=128)
    p_nopad = siren.SirenParams(
        weights=[p_pad.weights[0][:10]] + p_pad.weights[1:],
        biases=p_pad.biases,
    )
    x = jnp.asarray(np.random.default_rng(1).standard_normal((9, 10)), jnp.float32)
    a = siren.forward(p_pad, siren.pad_features(x, 128), spec)
    b = siren.forward(p_nopad, x, spec)
    # padding changes the matmul reduction tree, so equality is numerical,
    # not bitwise
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_flatten_unflatten_roundtrip():
    spec = ModelSpec(base_channel=32, num_layers=3)
    p = siren.init_params(jax.random.PRNGKey(7), 100, 4, spec)
    flat = siren.flatten_params(p, 100)
    assert flat.size == spec.param_count(100, 4)
    back = siren.unflatten_params(flat, 100, 4, spec)
    for a, b in zip(p.weights, back.weights):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(p.biases, back.biases):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flatten_order_is_torch_state_dict_order():
    """weight-then-bias per layer, torch (out, in) row-major flattening
    (reference encode.py:124-128)."""
    spec = ModelSpec(base_channel=2, num_layers=1)
    w0 = jnp.arange(6, dtype=jnp.float32).reshape(3, 2)  # (in=3, out=2)
    b0 = jnp.asarray([10.0, 11.0])
    w1 = jnp.asarray([[20.0], [21.0]])  # (in=2, out=1)
    b1 = jnp.asarray([30.0])
    p = siren.SirenParams(weights=[w0, w1], biases=[b0, b1])
    flat = siren.flatten_params(p, 3)
    # torch weight layout (out,in) row-major: w0.T = [[0,2,4],[1,3,5]]
    np.testing.assert_array_equal(
        flat, [0, 2, 4, 1, 3, 5, 10, 11, 20, 21, 30]
    )
