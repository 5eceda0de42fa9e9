import time, functools, numpy as np, jax, jax.numpy as jnp

n = 2048*2048
nc = 100
bs = 8192
key = jax.random.PRNGKey(0)

def bench(fn, *a, iters=200):
    r = fn(*a); s = int(jnp.sum(r) // jnp.int32(1))
    t0 = time.time()
    for _ in range(iters): r = fn(*a)
    s = float(jnp.ravel(r)[0]); t = (time.time()-t0)/iters
    return t

for g in (8, 32, 128):
    n_g = n // g
    taps = jnp.zeros((n_g, g*nc), jnp.int8)
    bpg = bs // g
    idx = jax.random.randint(key, (bpg,), 0, n_g)
    f = jax.jit(lambda t, i: t[i])
    t = bench(f, taps, idx)
    mb = bpg*g*nc/1e6
    print(f"gather g={g:4d}: rows {bpg:5d} x {g*nc:6d}B = {mb:.2f}MB -> {t*1e6:.0f}us ({mb/t/1e3:.1f} GB/s)")

# einsum fwd+bwd+adam-ish step cost for E=4 (no gather)
E=4
x = jnp.zeros((E, bs, 128), jnp.float32)
y = jnp.zeros((E, bs, 4), jnp.float32)
ws = [jnp.zeros((E,128,64)), jnp.zeros((E,64,64)), jnp.zeros((E,64,4))]
bss = [jnp.zeros((E,64)), jnp.zeros((E,64)), jnp.zeros((E,4))]
import jax.nn
def loss(ws, bss, x):
    h = x
    for i in range(2):
        h = jnp.sin(30.0*(jnp.einsum('ebi,eio->ebo', h, ws[i], precision=jax.lax.Precision.HIGHEST)+bss[i][:,None,:]))
    z = jnp.einsum('ebi,eio->ebo', h, ws[2], precision=jax.lax.Precision.HIGHEST)+bss[2][:,None,:]
    return ((jax.nn.sigmoid(z)-y)**2).sum()
gfn = jax.jit(jax.grad(loss, argnums=(0,1)))
t = bench(lambda: gfn(ws, bss, x), iters=100)
print(f"einsum fwd+bwd E=4 HIGHEST: {t*1e6:.0f}us")
def loss1(w1, b1, x1):
    h = x1
    for i in range(2):
        h = jnp.sin(30.0*(jnp.dot(h, w1[i], precision=jax.lax.Precision.HIGHEST)+b1[i]))
    z = jnp.dot(h, w1[2], precision=jax.lax.Precision.HIGHEST)+b1[2]
    return ((jax.nn.sigmoid(z)-y[0])**2).sum()
g1 = jax.jit(jax.grad(loss1, argnums=(0,1)))
t = bench(lambda: g1([w[0] for w in ws],[b[0] for b in bss], x[0]), iters=100)
print(f"dot fwd+bwd E=1 HIGHEST: {t*1e6:.0f}us")
