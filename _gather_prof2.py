import time, numpy as np, jax, jax.numpy as jnp

n = 2048*2048
nc = 100
bs = 8192
steps = 512
key = jax.random.PRNGKey(0)

def timed(f, *a):
    r = f(*a); s = float(jnp.ravel(r)[0])
    t0 = time.time(); r = f(*a); s = float(jnp.ravel(r)[0]); t = time.time()-t0
    return t

for E in (1, 4):
    for g in (8, 32):
        n_g = n // g
        bpg = bs // g
        taps = [jnp.zeros((n_g, g*nc), jnp.int8) for _ in range(E)]
        perm = jax.random.randint(key, (steps, bpg), 0, n_g)
        @jax.jit
        def run(taps, perm):
            def body(acc, gidx):
                xs = [t[gidx].astype(jnp.float32) for t in taps]
                return acc + sum(x.sum() for x in xs), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), perm)
            return acc
        t = timed(run, taps, perm)
        print(f"scan gather E={E} g={g:3d}: {t:.3f}s total -> {t/steps*1e6:.0f}us/step")
