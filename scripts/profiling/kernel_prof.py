"""Fused-step kernel anatomy: which part costs the step time?

Variants of the fused forward/backward/Adam kernel, each run as a 512-step
scan on one fixed (8192, 128) batch (bc=64, nl=2, C=4 — the bench config);
pass variant names as argv (default: all):

  prod_f32      the production _fwd_bwd (shared-reduction sincos), f32 dots
  prod_bf16     same with bf16-cast matmul inputs (measured a wash on v5e)
  full_t        the r2-era kernel: jnp.sin fwd + jnp.cos bwd, explicit .T
  full_dg       full_t with backward matmuls via dot_general (no .T)
  fast_full     full_t with the 2pi-period poly sin/cos prototypes
  prec_default / prec_high   lax.Precision probes on the f32 dots
  fwd_notrans   matmuls only (activations replaced by identity)
  tile2048      full_dg at TILE=2048 (grid 4) — per-grid-step overhead probe

Run from /root/repo with the axon env (see memory note).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, F, BC, C, L = 8192, 128, 64, 4, 3
W0S = (30.0, 30.0, 0.0)
ADAM_B1, ADAM_B2, ADAM_EPS = 0.9, 0.999, 1e-8

_INV2PI = 0.15915494309189535
_SIN_C = (6.283183466e+00, -4.134148036e+01, 8.159765788e+01,
          -7.659492822e+01, 4.126992957e+01, -1.237249482e+01)


def _fast_sin(x):
    t = x * _INV2PI
    t = t - jnp.round(t)
    t2 = t * t
    p = jnp.float32(_SIN_C[5])
    for k in (4, 3, 2, 1, 0):
        p = p * t2 + jnp.float32(_SIN_C[k])
    return t * p


def _fast_cos(x):
    return _fast_sin(x + jnp.float32(jnp.pi / 2))


def make_kernel(mode: str, use_dg: bool):
    prec = {
        "prec_default": jax.lax.Precision.DEFAULT,
        "prec_high": jax.lax.Precision.HIGH,
    }.get(mode)

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=prec)

    def kernel(*refs):
        (scalars_ref, x_ref, y_ref, mask_ref) = refs[:4]
        pos = 4
        w_refs = refs[pos : pos + L]; pos += L
        b_refs = refs[pos : pos + L]; pos += L
        mw = refs[pos : pos + L]; pos += L
        vw = refs[pos : pos + L]; pos += L
        mb = refs[pos : pos + L]; pos += L
        vb = refs[pos : pos + L]; pos += L
        nw = refs[pos : pos + L]; pos += L
        nb = refs[pos : pos + L]; pos += L
        nmw = refs[pos : pos + L]; pos += L
        nvw = refs[pos : pos + L]; pos += L
        nmb = refs[pos : pos + L]; pos += L
        nvb = refs[pos : pos + L]; pos += L
        loss_ref = refs[pos]; pos += 1
        acc_dw = refs[pos : pos + L]; pos += L
        acc_db = refs[pos : pos + L]; pos += L
        loss_acc = refs[pos]

        t = pl.program_id(0)
        n_tiles = pl.num_programs(0)

        @pl.when(t == 0)
        def _zero():
            for l in range(L):
                acc_dw[l][...] = jnp.zeros_like(acc_dw[l])
                acc_db[l][...] = jnp.zeros_like(acc_db[l])
            loss_acc[...] = jnp.zeros_like(loss_acc)

        x = x_ref[...]
        y = y_ref[...]
        mask = mask_ref[...]

        from lbdrn_msic_tpu.ops.fused_step import _fwd_bwd

        if mode in ("prod_f32", "prod_bf16"):
            # the production shared forward/backward (sincos + optional bf16)
            mmd = jnp.bfloat16 if mode == "prod_bf16" else None
            sse, dws, dbs = _fwd_bwd(
                x, y, mask,
                [w[...] for w in w_refs], [b[...] for b in b_refs],
                W0S, L, mmd,
            )
            loss_acc[...] = loss_acc[...] + sse.reshape(1, 1)
            for l in range(L):
                acc_dw[l][...] += dws[l]
                acc_db[l][...] += dbs[l]

            @pl.when(t == n_tiles - 1)
            def _update_prod():
                lr = scalars_ref[0, 0]
                c1 = scalars_ref[0, 1]
                c2 = scalars_ref[0, 2]
                inv = scalars_ref[0, 3]
                for l in range(L):
                    for grad, theta, m, v, nt, nm, nv in (
                        (acc_dw[l][...] * inv, w_refs[l], mw[l], vw[l],
                         nw[l], nmw[l], nvw[l]),
                        (acc_db[l][...] * inv, b_refs[l], mb[l], vb[l],
                         nb[l], nmb[l], nvb[l]),
                    ):
                        m_new = ADAM_B1 * m[...] + (1.0 - ADAM_B1) * grad
                        v_new = ADAM_B2 * v[...] + (1.0 - ADAM_B2) * grad * grad
                        nt[...] = theta[...] - lr * (m_new * c1) / (
                            jnp.sqrt(v_new * c2) + ADAM_EPS
                        )
                        nm[...] = m_new
                        nv[...] = v_new
                loss_ref[...] = loss_acc[...] * inv
            return

        # fast_full measures the 2pi-period poly prototypes exactly as the
        # docstring says (the production shared-reduction sincos is what
        # prod_f32 measures, via _fwd_bwd)
        sin_fn = _fast_sin if mode == "fast_full" else jnp.sin
        cos_fn = _fast_cos if mode == "fast_full" else jnp.cos
        zs = []
        h = x
        for l in range(L - 1):
            z = dot(h, w_refs[l][...]) + b_refs[l][...]
            zs.append(z)
            h = z if mode == "fwd_notrans" else sin_fn(W0S[l] * z)
            zs.append(h)
        z_last = dot(h, w_refs[L - 1][...]) + b_refs[L - 1][...]
        p = z_last if mode == "fwd_notrans" else 1.0 / (1.0 + jnp.exp(-z_last))

        diff = (p - y) * mask
        loss_acc[...] = loss_acc[...] + jnp.sum(diff * diff).reshape(1, 1)

        if mode == "fwd" or mode == "fwd_notrans":
            for l in range(L):
                nw[l][...] = w_refs[l][...]
                nb[l][...] = b_refs[l][...]
                nmw[l][...] = mw[l][...]
                nvw[l][...] = vw[l][...]
                nmb[l][...] = mb[l][...]
                nvb[l][...] = vb[l][...]
            loss_ref[...] = loss_acc[...]
            return

        def dT(a, b):
            if use_dg:
                return jax.lax.dot_general(
                    a, b, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )
            return dot(a.T, b)

        g = 2.0 * diff * (p * (1.0 - p))
        h_in = zs[2 * (L - 2) + 1] if L > 1 else x
        acc_dw[L - 1][...] += dT(h_in, g)
        acc_db[L - 1][...] += jnp.sum(g, axis=0, keepdims=True)
        for l in range(L - 2, -1, -1):
            if use_dg:
                g = jax.lax.dot_general(
                    g, w_refs[l + 1][...], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )
            else:
                g = dot(g, w_refs[l + 1][...].T)
            z = zs[2 * l]
            g = g * (W0S[l] * cos_fn(W0S[l] * z))
            h_in = zs[2 * (l - 1) + 1] if l > 0 else x
            acc_dw[l][...] += dT(h_in, g)
            acc_db[l][...] += jnp.sum(g, axis=0, keepdims=True)

        @pl.when(t == n_tiles - 1)
        def _update():
            lr = scalars_ref[0, 0]
            c1 = scalars_ref[0, 1]
            c2 = scalars_ref[0, 2]
            inv = scalars_ref[0, 3]
            for l in range(L):
                for grad, theta, m, v, nt, nm, nv in (
                    (acc_dw[l][...] * inv, w_refs[l], mw[l], vw[l],
                     nw[l], nmw[l], nvw[l]),
                    (acc_db[l][...] * inv, b_refs[l], mb[l], vb[l],
                     nb[l], nmb[l], nvb[l]),
                ):
                    m_new = ADAM_B1 * m[...] + (1.0 - ADAM_B1) * grad
                    v_new = ADAM_B2 * v[...] + (1.0 - ADAM_B2) * grad * grad
                    nt[...] = theta[...] - lr * (m_new * c1) / (
                        jnp.sqrt(v_new * c2) + ADAM_EPS
                    )
                    nm[...] = m_new
                    nv[...] = v_new
            loss_ref[...] = loss_acc[...] * inv

    return kernel


@functools.partial(jax.jit, static_argnames=("mode", "use_dg", "tile"))
def run_steps(ws, bs_, x, y, mask, mode, use_dg, tile):
    n_tiles = B // tile
    zeros_w = [jnp.zeros_like(w) for w in ws]
    zeros_b = [jnp.zeros_like(b) for b in bs_]

    full = lambda a: pl.BlockSpec(a.shape, lambda t: tuple(0 for _ in a.shape),
                                  memory_space=pltpu.VMEM)
    tile_spec = lambda width: pl.BlockSpec(
        (tile, width), lambda t: (t, 0), memory_space=pltpu.VMEM
    )

    def one_step(carry, i):
        ws, bs_, mws, vws, mbs, vbs = carry
        scalars = jnp.stack(
            [jnp.float32(1e-3), jnp.float32(1.0), jnp.float32(1.0),
             jnp.float32(1.0 / (B * C))]
        ).reshape(1, 4)
        in_specs = (
            [pl.BlockSpec((1, 4), lambda t: (0, 0), memory_space=pltpu.SMEM)]
            + [tile_spec(F), tile_spec(C), tile_spec(1)]
            + [full(a) for a in ws + bs_ + mws + vws + mbs + vbs]
        )
        out_shapes = (
            [jax.ShapeDtypeStruct(a.shape, a.dtype)
             for a in ws + bs_ + mws + vws + mbs + vbs]
            + [jax.ShapeDtypeStruct((1, 1), jnp.float32)]
        )
        out_specs = (
            [full(a) for a in ws + bs_ + mws + vws + mbs + vbs]
            + [pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.VMEM)]
        )
        aliases = {4 + i: i for i in range(6 * L)}
        scratch = (
            [pltpu.VMEM(a.shape, jnp.float32) for a in ws]
            + [pltpu.VMEM(b.shape, jnp.float32) for b in bs_]
            + [pltpu.VMEM((1, 1), jnp.float32)]
        )
        outs = pl.pallas_call(
            make_kernel(mode, use_dg),
            grid=(n_tiles,),
            in_specs=in_specs,
            out_shape=out_shapes,
            out_specs=out_specs,
            scratch_shapes=scratch,
            input_output_aliases=aliases,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        )(scalars, x, y, mask, *ws, *bs_, *mws, *vws, *mbs, *vbs)
        new = (list(outs[0:L]), list(outs[L:2*L]), list(outs[2*L:3*L]),
               list(outs[3*L:4*L]), list(outs[4*L:5*L]), list(outs[5*L:6*L]))
        return new, outs[6 * L].reshape(())

    carry0 = (ws, bs_, zeros_w, zeros_w, zeros_b, zeros_b)
    _, losses = jax.lax.scan(one_step, carry0, jnp.arange(512))
    return losses.sum()


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    ws = [
        jax.random.normal(ks[0], (F, BC), jnp.float32) * 0.05,
        jax.random.normal(ks[1], (BC, BC), jnp.float32) * 0.05,
        jax.random.normal(ks[2], (BC, C), jnp.float32) * 0.05,
    ]
    bs_ = [
        jnp.zeros((1, BC), jnp.float32),
        jnp.zeros((1, BC), jnp.float32),
        jnp.zeros((1, C), jnp.float32),
    ]
    x = jax.random.uniform(ks[3], (B, F), jnp.float32, -1, 1)
    y = jax.random.uniform(ks[4], (B, C), jnp.float32)
    mask = jnp.ones((B, 1), jnp.float32)

    def timed(label, fn, n=3):
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            float(fn())
            best = min(best, time.time() - t0)
        print(f"{label:>12}: {best*1e3:8.1f} ms ({best/512*1e6:6.1f} us/step)",
              flush=True)

    import sys

    variants = {
        "prod_f32": ("prod_f32", False, B),
        "prod_bf16": ("prod_bf16", False, B),
        "full_t": ("full", False, B),
        "full_dg": ("full", True, B),
        "fast_full": ("fast_full", False, B),
        "prec_default": ("prec_default", False, B),
        "prec_high": ("prec_high", False, B),
        "fwd_notrans": ("fwd_notrans", False, B),
        "tile2048": ("full", True, 2048),
    }
    wanted = sys.argv[1:] or list(variants)
    for label in wanted:
        mode, use_dg, tile = variants[label]
        timed(label, lambda m=mode, d=use_dg, t=tile: run_steps(
            ws, bs_, x, y, mask, m, d, t))


if __name__ == "__main__":
    main()
