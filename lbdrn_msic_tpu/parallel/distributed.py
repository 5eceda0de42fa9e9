"""Multi-host execution support.

The reference has no distributed layer (SURVEY §2.3); here multi-host runs
are the same mesh programs over a larger device set:

- `initialize_cluster()` wires `jax.distributed` (one process per host;
  coordinator address from env or args).  After it, `jax.devices()` spans
  the slice and `parallel.shard.make_mesh` can build meshes whose "dp" psum
  rides ICI within a slice while the "ep" fan-out of independent
  (image, K, tile) jobs needs no cross-host traffic at all.
- `JobScheduler` partitions an embarrassingly-parallel job list across
  hosts deterministically and gathers per-job artifacts through the shared
  filesystem — the reference's run.sh sweep (run.sh:29-40) generalized to a
  pod, with the same artifact-existence resumability.
"""

from __future__ import annotations

import dataclasses
import os
import sys
from typing import Callable, List, Optional, Sequence, TypeVar

import jax

T = TypeVar("T")


def initialize_cluster(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed from args or JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars.  No-op single-process if
    neither is configured."""
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is None:
        return
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num_processes or int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=process_id or int(os.environ["JAX_PROCESS_ID"]),
    )


@dataclasses.dataclass
class JobScheduler:
    """Deterministic static partition of independent jobs across processes.

    Jobs are identified by a string key; `done` (artifact existence) gives
    per-job idempotent resume, matching the reference's log-marker scheme
    (reference encode.py:216-224).
    """

    num_processes: int = 1
    process_id: int = 0

    @classmethod
    def from_runtime(cls) -> "JobScheduler":
        return cls(num_processes=jax.process_count(), process_id=jax.process_index())

    def mine(self, jobs: Sequence[T]) -> List[T]:
        return [j for i, j in enumerate(jobs) if i % self.num_processes == self.process_id]

    def run(
        self,
        jobs: Sequence[T],
        work: Callable[[T], None],
        done: Optional[Callable[[T], bool]] = None,
        retries: int = 0,
    ) -> List[T]:
        """Run this process's share; returns the jobs it executed.

        `retries`: per-job retry budget for transient failures (a killed
        device claim, a flaky remote compile) — the job re-runs up to
        `retries` extra times before its exception propagates.  With a
        `done` marker this composes with sweep-level resume: a job that
        completed between attempts is skipped on retry.
        """
        if retries < 0:
            raise ValueError(f"retries must be >= 0, got {retries}")
        ran = []
        for job in self.mine(jobs):
            if done is not None and done(job):
                continue
            for attempt in range(retries + 1):
                if attempt and done is not None and done(job):
                    break
                try:
                    work(job)
                    break
                except Exception as e:
                    if attempt == retries:
                        raise
                    print(
                        f"[scheduler] job {job!r} attempt {attempt + 1} "
                        f"failed ({type(e).__name__}: {e}); retrying",
                        file=sys.stderr,
                    )
            ran.append(job)
        return ran
