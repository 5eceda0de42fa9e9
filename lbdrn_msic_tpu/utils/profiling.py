"""Profiling and phase timing.

The reference's observability is a wall-clock print around whole runs
(reference encode.py:226,283-284; SURVEY §5 tracing row).  Here:

- `PhaseTimer` — named phase accounting (feature staging, train loop, host
  codecs, transfers) surfaced in EncodeStats/logs,
- `trace()` — context manager around `jax.profiler` emitting a TensorBoard-
  loadable trace of the device timeline for any region.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator


class PhaseTimer:
    def __init__(self):
        self.phases: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.time()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + (time.time() - t0)

    def report(self) -> str:
        total = sum(self.phases.values())
        parts = [f"{k}={v:.3f}s" for k, v in sorted(self.phases.items())]
        return f"total={total:.3f}s  " + " ".join(parts)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (open with TensorBoard or Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
