"""Multi-host scaffolding tests (single-process semantics)."""

import os

from lbdrn_msic_tpu.parallel.distributed import JobScheduler, initialize_cluster
from lbdrn_msic_tpu.utils.profiling import PhaseTimer


def test_initialize_cluster_noop_without_env(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    initialize_cluster()  # must not raise or initialize anything


def test_job_scheduler_partition():
    jobs = [f"j{i}" for i in range(10)]
    shards = [JobScheduler(num_processes=3, process_id=p).mine(jobs) for p in range(3)]
    assert sorted(sum(shards, [])) == sorted(jobs)
    assert all(len(s) in (3, 4) for s in shards)
    # disjoint
    assert len(set(sum(shards, []))) == 10


def test_job_scheduler_resume():
    done = {"a"}
    ran = JobScheduler().run(
        ["a", "b", "c"], work=lambda j: None, done=lambda j: j in done
    )
    assert ran == ["b", "c"]


def test_trace_smoke(tmp_path):
    """trace() captures a loadable profiler trace directory."""
    import jax.numpy as jnp

    from lbdrn_msic_tpu.utils.profiling import trace

    with trace(str(tmp_path)):
        jnp.arange(8).sum().block_until_ready()
    # jax.profiler writes plugins/profile/<ts>/*; presence = capture worked
    found = list(tmp_path.rglob("*.xplane.pb")) + list(tmp_path.rglob("*.trace.json*"))
    assert found


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("x"):
        pass
    with t.phase("x"):
        pass
    with t.phase("y"):
        pass
    assert set(t.phases) == {"x", "y"}
    assert "x=" in t.report()
