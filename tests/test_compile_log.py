"""Per-program compile accounting (utils/compile_log; VERDICT r3 weak #1)."""

import jax
import jax.numpy as jnp

from lbdrn_msic_tpu.utils.compile_log import CompileLog, format_compile_json


def test_compile_log_attributes_programs():
    @jax.jit
    def alpha_prog(x):
        return (x * 2.0).sum()

    @jax.jit
    def beta_prog(x):
        return (x + 1.0).mean()

    with CompileLog() as cl:
        alpha_prog(jnp.ones((16, 16))).block_until_ready()
        beta_prog(jnp.ones((16, 16))).block_until_ready()
        alpha_prog(jnp.ones((16, 16))).block_until_ready()  # cached: no compile

    by = cl.by_program()
    assert "alpha_prog" in by and "beta_prog" in by
    assert cl.counts()["alpha_prog"] == 1  # second call hit the jit cache
    assert cl.total() >= sum(by.values()) - 1e-9
    rep = cl.report(min_secs=0.0)
    assert "alpha_prog" in rep and "backend total" in rep
    js = format_compile_json(cl, top=8)
    assert all(isinstance(v, float) for v in js.values())


def test_compile_log_inactive_outside_scope():
    with CompileLog() as cl:
        pass

    @jax.jit
    def gamma_prog(x):
        return x - 1.0

    gamma_prog(jnp.ones((8, 8))).block_until_ready()
    assert "gamma_prog" not in cl.by_program()


def test_compile_log_recompile_counts_per_shape():
    """Two shapes of one jitted fn show up as two compiles of one program —
    the probe shape-bucketing uses to prove compile reuse."""
    @jax.jit
    def delta_prog(x):
        return x.sum()

    with CompileLog() as cl:
        delta_prog(jnp.ones((4, 4))).block_until_ready()
        delta_prog(jnp.ones((8, 8))).block_until_ready()
    assert cl.counts()["delta_prog"] == 2
