"""Multi-host scaffolding tests (single-process semantics)."""

import os

import pytest

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


def test_job_scheduler_retries():
    """Transient failures retry up to the budget; persistent ones raise;
    a job completed between attempts is skipped via the done marker."""
    attempts = {}

    def flaky(j):
        attempts[j] = attempts.get(j, 0) + 1
        if j == "b" and attempts[j] < 3:
            raise RuntimeError("transient")

    ran = JobScheduler().run(["a", "b"], flaky, retries=2)
    assert ran == ["a", "b"] and attempts == {"a": 1, "b": 3}

    with pytest.raises(ZeroDivisionError):
        JobScheduler().run(["c"], lambda j: 1 / 0, retries=1)

    # completes out-of-band after the first failure -> retry skips the work
    state = {"n": 0, "done": False}

    def once(j):
        state["n"] += 1
        state["done"] = True
        raise RuntimeError("died after completing")

    ran = JobScheduler().run(
        ["x"], once, done=lambda j: state["done"], retries=1
    )
    assert ran == ["x"] and state["n"] == 1


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
