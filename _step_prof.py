import time, numpy as np, jax, jax.numpy as jnp, optax, functools
from lbdrn_msic_tpu.models.siren import SirenParams, forward_experts, pad_features
from lbdrn_msic_tpu.core.config import ModelSpec

n = 2048*2048; nc = 100; bs = 8192; steps = 512; C = 4; g = 8
mspec = ModelSpec()
key = jax.random.PRNGKey(0)

def timed(f, *a):
    r = f(*a); s = float(jnp.ravel(jax.tree.leaves(r)[0])[0])
    t0 = time.time(); r = f(*a); s = float(jnp.ravel(jax.tree.leaves(r)[0])[0]); t = time.time()-t0
    return t

for E in (1, 4):
    n_g = n // g; bpg = bs // g
    taps = [jnp.zeros((n_g, g*nc), jnp.int8) for _ in range(E)]
    raw = jnp.zeros((n_g, g*C), jnp.uint16)
    scales = jnp.ones((E,), jnp.float32); lscales = jnp.ones((E,), jnp.float32)
    kmasks = jnp.full((E,), 31, jnp.uint16)
    perm = jax.random.randint(key, (steps, bpg), 0, n_g)
    params = SirenParams(
        weights=[jnp.zeros((E,128,64)), jnp.zeros((E,64,64)), jnp.zeros((E,64,C))],
        biases=[jnp.zeros((E,64)), jnp.zeros((E,64)), jnp.zeros((E,C))])
    opt = optax.adam(1e-3)

    def make_batch(gidx):
        xs = [ (t[gidx].astype(jnp.float32) * scales[e]).reshape(bs, nc) for e, t in enumerate(taps)]
        x = pad_features(jnp.stack(xs), 128)
        rows = raw[gidx].reshape(bs, C)
        y = (rows[None] & kmasks[:,None,None]).astype(jnp.float32) * lscales[:,None,None]
        return x, y

    @jax.jit
    def batch_only(perm):
        def body(acc, gidx):
            x, y = make_batch(gidx)
            return acc + x.sum() + y.sum(), None
        return jax.lax.scan(body, jnp.float32(0), perm)[0]

    @jax.jit
    def fwd_only(params, perm):
        def body(acc, gidx):
            x, y = make_batch(gidx)
            pred = forward_experts(params, x, mspec)
            return acc + pred.sum(), None
        return jax.lax.scan(body, jnp.float32(0), perm)[0]

    @jax.jit
    def full_step(params, perm):
        opt_state = opt.init(params)
        def body(carry, gidx):
            params, opt_state = carry
            x, y = make_batch(gidx)
            def loss_fn(p):
                pred = forward_experts(p, x, mspec)
                se = ((pred - y)**2).sum(axis=(1,2))
                return se.sum(), se
            (_, l), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            u, opt_state = opt.update(grads, opt_state, params)
            return (optax.apply_updates(params, u), opt_state), l
        (params, _), _ = jax.lax.scan(body, (params, opt_state), perm)
        return params

    t1 = timed(batch_only, perm)
    t2 = timed(fwd_only, params, perm)
    t3 = timed(full_step, params, perm)
    print(f"E={E}: batch {t1/steps*1e6:.0f}us fwd {t2/steps*1e6:.0f}us full {t3/steps*1e6:.0f}us/step")
