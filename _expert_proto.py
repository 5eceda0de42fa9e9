import time, functools, numpy as np, jax, jax.numpy as jnp
import optax
from lbdrn_msic_tpu.core.config import FeatureSpec, ModelSpec, TrainSpec
from lbdrn_msic_tpu.features.engine import build_label_matrix, build_tap_matrix, lsb_scale, pad_plane, split_msb_lsb
from lbdrn_msic_tpu.models.siren import forward, init_params, pad_dim, pad_features
from lbdrn_msic_tpu.utils.synth import synth_scene

H = W = 2048; C = 4; E = 4
img = jnp.asarray(synth_scene(H, W, channels=C, effective_bits=12, seed=42))
fspec, mspec, tspec = FeatureSpec(), ModelSpec(), TrainSpec(sample_granule=8)
g = tspec.sample_granule; bs = tspec.batch_size
n = H*W; n_g = n//g; bpg = bs//g
steps = n_g // bpg
n_colors = fspec.num_color_features(C)
dim_in = fspec.feature_dim(C); padded_in = pad_dim(dim_in)

@functools.partial(jax.jit, static_argnames=())
def stage(K):
    msb, lsb = split_msb_lsb(img, K)
    plane, scale = pad_plane(msb, fspec.D)
    taps = build_tap_matrix(plane, fspec, H, W, jnp.dtype('int8'), pad_rows_to=n)
    return taps.reshape(n_g, g*n_colors), build_label_matrix(lsb).reshape(n_g, g*C), scale, 1.0/((jnp.int32(1)<<K).astype(jnp.float32)-1.0)

Ks = (3,4,5,6)
parts = [stage(jnp.int32(K)) for K in Ks]
taps_cat = jnp.concatenate([p[0] for p in parts], axis=1)      # (n_g, E*g*nc)
labels_cat = jnp.concatenate([p[1] for p in parts], axis=1)    # (n_g, E*g*C)
scales = jnp.stack([p[2] for p in parts])                      # (E,)
lscales = jnp.stack([p[3] for p in parts])

key = jax.random.PRNGKey(0)
params1 = init_params(key, dim_in, C, mspec, pad_input_to=padded_in)
paramsE = jax.tree.map(lambda a: jnp.stack([a]*E), params1)

def fwdE(p, x):  # x: (E, B, padded_in)
    h = x
    L = len(p.weights)
    w0s = [mspec.w0_initial] + [mspec.w0]*(mspec.num_layers-1)
    for l in range(L-1):
        h = jnp.sin(w0s[l] * (jnp.einsum('ebi,eio->ebo', h, p.weights[l]) + p.biases[l][:,None,:]))
    z = jnp.einsum('ebi,eio->ebo', h, p.weights[L-1]) + p.biases[L-1][:,None,:]
    return jax.nn.sigmoid(z)

opt = optax.adam(tspec.lr)

@jax.jit
def run_epoch(paramsE, opt_state, key):
    perm = jax.random.permutation(key, n_g).reshape(steps, bpg)
    def step(carry, gidx):
        paramsE, opt_state = carry
        rows_t = taps_cat[gidx]                      # (bpg, E*g*nc) one fast row gather
        rows_l = labels_cat[gidx]
        x = rows_t.reshape(bpg, E, g, n_colors).transpose(1,0,2,3).reshape(E, bs, n_colors)
        x = x.astype(jnp.float32) * scales[:,None,None]
        x = pad_features(x, padded_in)
        y = rows_l.reshape(bpg, E, g, C).transpose(1,0,2,3).reshape(E, bs, C)
        y = y.astype(jnp.float32) * lscales[:,None,None]
        def loss_fn(p):
            pred = fwdE(p, x)
            return ((pred - y)**2).mean()  # prototype: joint mean (grad scale /E vs real; ok for timing)
        loss, grads = jax.value_and_grad(loss_fn)(paramsE)
        updates, opt_state = opt.update(grads, opt_state, paramsE)
        return (optax.apply_updates(paramsE, updates), opt_state), loss
    (paramsE, opt_state), losses = jax.lax.scan(step, (paramsE, opt_state), perm)
    return paramsE, opt_state, losses.mean()

opt_state = opt.init(paramsE)
p, o, l = run_epoch(paramsE, opt_state, key)
lv = float(l)
t0=time.time()
for e in range(10):
    p, o, l = run_epoch(p, o, jax.random.fold_in(key, e))
lv = float(l); t=time.time()-t0
print(f"expert-batched XLA: {t:.2f}s for 10 epochs x {E} experts -> {t/E:.2f}s/job (loss {lv:.5f})")
