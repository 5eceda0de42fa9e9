import sys, time, numpy as np, jax, jax.numpy as jnp
import lbdrn_msic_tpu.ops.fused_step as fs
budget = int(sys.argv[1]); g = int(sys.argv[2])
fs._VMEM_BUDGET = budget << 20
from lbdrn_msic_tpu.core.config import FeatureSpec, ModelSpec, TrainSpec
from lbdrn_msic_tpu.features.engine import tap_matrix_dtype
from lbdrn_msic_tpu.train.loop import fit_rate_experts
from lbdrn_msic_tpu.utils.synth import synth_scene

H = W = 2048; C = 4
img = synth_scene(H, W, channels=C, effective_bits=12, seed=42)
fspec, mspec = FeatureSpec(), ModelSpec()
tspec = TrainSpec(sample_granule=g)
Ks = (3, 4, 5, 6)
max_img = int(img.max())
dts = tuple(jnp.dtype(tap_matrix_dtype(max_img >> k, fspec.relative)).name for k in Ks)
dev = jnp.asarray(img)
key = jax.random.fold_in(jax.random.PRNGKey(tspec.seed), 0)
print("tile =", fs.pick_tile(8192, 128, C, mspec), "g =", g)
def run():
    r = fit_rate_experts(dev, Ks, key, fspec, mspec, tspec, H, W, C, dts, use_fused=True)
    return float(np.ravel(jax.device_get(r.best_mse))[-1])
mse = run()
ts = []
for _ in range(3):
    t0 = time.time(); run(); ts.append(time.time()-t0)
print(f"budget {budget}M g={g}: {['%.2f'%t for t in ts]} best {min(ts)/4:.3f}s/job mse {mse:.5f}")
