import sys, time, numpy as np, jax, jax.numpy as jnp
from lbdrn_msic_tpu.core.config import FeatureSpec, ModelSpec, TrainSpec
from lbdrn_msic_tpu.features.engine import tap_matrix_dtype
from lbdrn_msic_tpu.train.loop import fit_rate_experts
from lbdrn_msic_tpu.utils.synth import synth_scene

bc = int(sys.argv[1])
H = W = 2048; C = 4
img = synth_scene(H, W, channels=C, effective_bits=12, seed=42)
fspec, mspec = FeatureSpec(), ModelSpec(base_channel=bc)
tspec = TrainSpec(sample_granule=8)
Ks = (3, 4, 5, 6)
dts = tuple(jnp.dtype(tap_matrix_dtype(int(img.max()) >> k, fspec.relative)).name for k in Ks)
dev = jnp.asarray(img)
key = jax.random.fold_in(jax.random.PRNGKey(tspec.seed), 0)
def run():
    r = fit_rate_experts(dev, Ks, key, fspec, mspec, tspec, H, W, C, dts, use_fused=True)
    return float(np.ravel(jax.device_get(r.best_mse))[-1])
run()
ts = []
for _ in range(3):
    t0 = time.time(); run(); ts.append(time.time()-t0)
print(f"bc={bc}: {['%.2f'%t for t in ts]} best {min(ts)/4:.3f}s/job")
