"""Tracing / profiling utilities.

The reference's only observability is ``cout << k`` progress prints and
timing notes in comments (SURVEY.md section 5).  Here profiling is a
first-class module: phase wall-clock timers with derived throughput
metrics, and a thin wrapper over ``jax.profiler`` for device traces.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict

import jax


@dataclass
class PhaseTimer:
    """Accumulates wall-clock per named phase; blocks on device work so the
    numbers mean what they say."""

    phases: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.phases[name] = self.phases.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        total = sum(self.phases.values()) or 1.0
        lines = [f"{n:30s} {t:9.3f}s  x{self.counts[n]:<5d} "
                 f"{100 * t / total:5.1f}%"
                 for n, t in sorted(self.phases.items(),
                                    key=lambda kv: -kv[1])]
        return "\n".join(lines)

    def as_json(self) -> str:
        return json.dumps({"phases": self.phases, "counts": self.counts})


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def throughput(n_ions: int, n_ticks: int, seconds: float) -> dict:
    """Standard metrics for an MDQT run segment."""
    return {
        "ion_qt_updates_per_sec": n_ions * n_ticks / seconds,
        "us_per_quantum_tick": seconds / max(n_ticks, 1) * 1e6,
        "seconds": seconds,
    }
