import time, numpy as np, jax, jax.numpy as jnp
from lbdrn_msic_tpu.core.config import CodecConfig, FeatureSpec, ModelSpec, TrainSpec
from lbdrn_msic_tpu.features.engine import build_label_matrix, lsb_scale, pad_plane, split_msb_lsb
from lbdrn_msic_tpu.train.loop import fit, fit_core
from lbdrn_msic_tpu.utils.synth import synth_scene
import functools

H = W = 2048; C = 4
img = jnp.asarray(synth_scene(H, W, channels=C, effective_bits=12, seed=42))
fspec, mspec = FeatureSpec(), ModelSpec()
tspec = TrainSpec(sample_granule=8)

def prep(K):
    msb, lsb = split_msb_lsb(img, K)
    plane, scale = pad_plane(msb, fspec.D)
    return plane, scale, build_label_matrix(lsb), jnp.float32(lsb_scale(K))

Ks = (3, 4, 5, 6)
planes, scales, labels, lscales = map(jnp.stack, zip(*[prep(K) for K in Ks]))
key = jax.random.PRNGKey(0)
keys = jnp.stack([key]*4)

def timed(name, f, *a):
    r = f(*a)
    mse = float(np.ravel(jax.device_get(r.best_mse))[0])
    t0=time.time(); r = f(*a); mse = float(np.ravel(jax.device_get(r.best_mse))[-1]); t=time.time()-t0
    print(f"{name}: {t:.2f}s (best_mse {mse:.5f})")
    return t

# single fused job (current bench path)
t1 = timed("fused x1", functools.partial(fit, staged=True, tap_dtype="int8", use_fused=True),
      planes[2], scales[2], labels[2], lscales[2], key, fspec, mspec, tspec, H, W, C)
# single XLA job
t2 = timed("xla   x1", functools.partial(fit, staged=True, tap_dtype="int8", use_fused=False),
      planes[2], scales[2], labels[2], lscales[2], key, fspec, mspec, tspec, H, W, C)
# vmapped XLA x4 experts
vf = jax.jit(jax.vmap(functools.partial(
    fit_core, fspec=fspec, mspec=mspec, tspec=tspec, H=H, W=W, C=C,
    staged=True, tap_dtype="int8", use_fused=False),
    in_axes=(0,0,0,0,0)))
t3 = timed("xla   x4", vf, planes, scales, labels, lscales, keys)
print(f"per-job: fused {t1:.2f} xla {t2:.2f} vmap4 {t3/4:.2f}")
