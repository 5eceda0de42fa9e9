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


def test_bench_path_program_count_bounded():
    """The full codec path (single encode + rate sweep + dataset encode +
    decode) must stay a SMALL set of named programs: on the TPU backend
    every compile pays a 0.3-10 s remote-service round trip, and
    BENCH_r04's warm-up burned ~45 s on ~135 anonymous one-op programs
    (eager PRNGKey/fold_in, jnp scalar converts, stacks, plane indexing —
    VERDICT r4 #2).  This guard fails if an eager op leaks back into the
    path.  Uses fresh shapes so earlier tests' jit caches don't mask
    compiles."""
    import numpy as np

    from lbdrn_msic_tpu.codec import (
        decode_stream,
        encode_dataset,
        encode_image,
        encode_rate_points,
    )
    from lbdrn_msic_tpu.core.config import CodecConfig, TrainSpec
    from lbdrn_msic_tpu.utils import transfer
    from lbdrn_msic_tpu.utils.synth import synth_scene

    tr = TrainSpec(epochs=2, batch_size=2048)
    imgs = [
        synth_scene(136, 136, channels=2, effective_bits=12, seed=s)
        for s in (200, 201)
    ]
    old_min = transfer.MIN_DELTA_BYTES
    transfer.MIN_DELTA_BYTES = 1 << 10  # exercise the delta-h2d programs
    try:
        with CompileLog() as cl:
            stream, _ = encode_image(imgs[0], CodecConfig(K=5, train=tr))
            decode_stream(stream)
            encode_rate_points(
                imgs[0], [CodecConfig(K=k, train=tr) for k in (3, 5)]
            )
            encode_dataset(
                [(im, CodecConfig(K=k, train=tr))
                 for im in imgs for k in (3, 5)]
            )
    finally:
        transfer.MIN_DELTA_BYTES = old_min

    counts = cl.counts()
    allowed = {
        "fit", "fit_rate_experts", "_seed_key", "_fold_key",
        "_exc_scatter", "_undelta", "_prepare_tile",
        "_residual_band_planes", "_residual_band_planes_local",
        "_plane",
    }
    unexpected = set(counts) - allowed
    assert not unexpected, f"unexpected programs leaked: {unexpected}"
    total = sum(counts.values())
    assert total <= 16, f"program count regressed: {total} compiles {counts}"


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
