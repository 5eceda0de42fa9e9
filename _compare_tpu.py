import time, numpy as np, jax, jax.numpy as jnp
from lbdrn_msic_tpu.core.config import CodecConfig, FeatureSpec, ModelSpec, TrainSpec
from lbdrn_msic_tpu.features.engine import tap_matrix_dtype
from lbdrn_msic_tpu.train.loop import fit_rate_experts
from lbdrn_msic_tpu.codec import encode_pipelined
from lbdrn_msic_tpu.utils.synth import synth_scene

H = W = 2048; C = 4
img = synth_scene(H, W, channels=C, effective_bits=12, seed=42)
fspec, mspec = FeatureSpec(), ModelSpec()
tspec = TrainSpec(sample_granule=8)
Ks = (3, 4, 5, 6)
max_img = int(img.max())
dts = tuple(jnp.dtype(tap_matrix_dtype(max_img >> k, fspec.relative)).name for k in Ks)
dev = jnp.asarray(img)
key = jax.random.fold_in(jax.random.PRNGKey(tspec.seed), 0)

def run(use_fused):
    r = fit_rate_experts(dev, Ks, key, fspec, mspec, tspec, H, W, C, dts, use_fused=use_fused)
    return float(np.ravel(jax.device_get(r.best_mse))[-1])

for name, uf in (("xla  ", False), ("fused", True)):
    run(uf)  # compile
    ts = []
    for _ in range(4):
        t0 = time.time(); run(uf); ts.append(time.time()-t0)
    print(f"experts-{name}: {['%.2f'%t for t in ts]} -> best {min(ts)/4:.3f}s/job")

cfgs = [CodecConfig(K=K, train=tspec) for K in Ks]
jobs = [(img, c) for c in cfgs]
encode_pipelined(jobs)
ts = []
for _ in range(3):
    t0 = time.time(); encode_pipelined(jobs); ts.append(time.time()-t0)
print(f"pipelined: {['%.2f'%t for t in ts]} -> best {min(ts)/4:.3f}s/job")
