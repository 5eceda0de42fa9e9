"""Per-jitted-program compile-time accounting.

Warm-up cost on this backend is dominated by the remote compile service,
whose latency is wildly variable (CLAUDE.md: 20-470 s for the same
program) — so an unexplained warm-up regression is indistinguishable from
tunnel weather unless compile seconds are attributed PER PROGRAM
(VERDICT r3 weak #1).  This module hangs a ``jax.monitoring`` listener on
the compile-duration events and aggregates them by jitted function name:

    from lbdrn_msic_tpu.utils.compile_log import CompileLog
    with CompileLog() as cl:
        ...  # anything that compiles
    print(cl.report())

`backend_compile` is the remote-service time (the variable part);
`trace` + `lower` are local host work.  The bench wires this into its
warm-up phase and prints the table to stderr so every BENCH_rN records
where compile seconds went; `attribute_compiles()` is the module-level
always-on variant the CLIs use under ``--compile-log``.
"""

from __future__ import annotations

import collections
import threading
from typing import Dict, List, Optional, Tuple

_EVENTS = {
    "/jax/core/compile/backend_compile_duration": "compile",
    "/jax/core/compile/jaxpr_to_mlir_module_duration": "lower",
    "/jax/core/compile/jaxpr_trace_duration": "trace",
}


class CompileLog:
    """Context manager accumulating per-program compile seconds.

    Listeners are process-global in jax.monitoring, so instances guard
    with an `active` flag instead of unregistering (jax 0.9 has
    unregister, but nested/overlapping scopes are simpler this way and
    the listener itself costs nanoseconds when inactive).
    """

    _installed = False
    _instances: List["CompileLog"] = []
    _lock = threading.Lock()

    def __init__(self) -> None:
        # {(kind, fun_name): [secs, ...]}
        self.events: Dict[Tuple[str, str], List[float]] = collections.defaultdict(list)
        self._active = False

    # -- global listener plumbing -------------------------------------
    @classmethod
    def _ensure_listener(cls) -> None:
        with cls._lock:
            if cls._installed:
                return
            import jax.monitoring

            def _on_duration(event: str, secs: float, **kw) -> None:
                kind = _EVENTS.get(event)
                if kind is None:
                    return
                name = kw.get("fun_name", "?")
                # strip the jit() wrapper jax puts around lowered names
                if name.startswith("jit(") and name.endswith(")"):
                    name = name[4:-1]
                for inst in list(cls._instances):
                    if inst._active:
                        inst.events[(kind, name)].append(secs)

            jax.monitoring.register_event_duration_secs_listener(_on_duration)
            cls._installed = True

    def __enter__(self) -> "CompileLog":
        self._ensure_listener()
        with self._lock:
            if self not in self._instances:
                self._instances.append(self)
        self._active = True
        return self

    def __exit__(self, *exc) -> None:
        self._active = False
        with self._lock:
            if self in self._instances:
                self._instances.remove(self)

    # -- queries ------------------------------------------------------
    def total(self, kind: str = "compile") -> float:
        return sum(
            sum(v) for (k, _), v in self.events.items() if k == kind
        )

    def by_program(self, kind: str = "compile") -> Dict[str, float]:
        """{program: total seconds}, descending."""
        out: Dict[str, float] = collections.defaultdict(float)
        for (k, name), secs in self.events.items():
            if k == kind:
                out[name] += sum(secs)
        return dict(sorted(out.items(), key=lambda kv: -kv[1]))

    def counts(self, kind: str = "compile") -> Dict[str, int]:
        return {
            name: len(secs)
            for (k, name), secs in self.events.items()
            if k == kind
        }

    def report(self, min_secs: float = 0.05, top: Optional[int] = None) -> str:
        """Human table: per-program backend-compile seconds (+ host-side
        trace/lower time), biggest first."""
        lower = self.by_program("lower")
        trace = self.by_program("trace")
        counts = self.counts()
        rows = []
        items = list(self.by_program().items())
        if top is not None:
            items = items[:top]
        for name, secs in items:
            if secs < min_secs:
                continue
            host = lower.get(name, 0.0) + trace.get(name, 0.0)
            n = counts.get(name, 0)
            rows.append(
                f"  {secs:8.1f}s  x{n:<3d} host {host:5.2f}s  {name}"
            )
        head = (
            f"[compile] backend total {self.total():.1f}s over "
            f"{sum(counts.values())} compiles "
            f"(host trace+lower {self.total('trace') + self.total('lower'):.1f}s)"
        )
        return "\n".join([head] + rows)


def format_compile_json(cl: CompileLog, top: int = 8) -> Dict[str, float]:
    """Compact {program: secs} for embedding in the bench JSON line."""
    out = {}
    for name, secs in list(cl.by_program().items())[:top]:
        if secs >= 0.05:
            out[name] = round(secs, 1)
    return out
