"""Spatially-sharded decode (halo exchange) must be bit-identical to the
single-device decoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbdrn_msic_tpu.core.config import FeatureSpec, ModelSpec
from lbdrn_msic_tpu.decode.reconstruct import reconstruct
from lbdrn_msic_tpu.models.siren import init_params
from lbdrn_msic_tpu.parallel.halo import reconstruct_sp
from lbdrn_msic_tpu.parallel.shard import make_mesh
from lbdrn_msic_tpu.utils.synth import synth_scene


@pytest.mark.parametrize(
    "fspec",
    [FeatureSpec(), FeatureSpec(use_coords=True), FeatureSpec(D=1, relative=False)],
    ids=["rel-D2", "coords", "abs-D1"],
)
def test_sp_reconstruct_bitexact(fspec):
    mspec = ModelSpec(base_channel=32, num_layers=2)
    K = 5
    img = synth_scene(64, 48, channels=3, effective_bits=12, seed=61)
    base = jnp.asarray(img >> K)
    C, H, W = base.shape
    params = init_params(jax.random.PRNGKey(0), fspec.feature_dim(C), C, mspec)

    single = np.asarray(reconstruct(base, params, fspec, mspec, K, H, W))
    mesh = make_mesh(dp=4)
    sharded = reconstruct_sp(mesh, base, params, fspec, mspec, K)
    np.testing.assert_array_equal(sharded, single)


def test_sp_rejects_indivisible():
    fspec = FeatureSpec()
    mspec = ModelSpec(base_channel=16, num_layers=1)
    img = synth_scene(30, 16, channels=1, seed=62)
    base = jnp.asarray(img >> 3)
    params = init_params(jax.random.PRNGKey(0), fspec.feature_dim(1), 1, mspec)
    with pytest.raises(ValueError, match="divide"):
        reconstruct_sp(make_mesh(dp=4), base, params, fspec, mspec, 3)
