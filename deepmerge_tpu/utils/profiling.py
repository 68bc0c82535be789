"""Per-phase timing + optional jax.profiler traces.

The reference's only observability is tqdm bar text and ``time.time()`` ETA
prints (``Train_SMT.py:302-307,345-349``); here every pipeline phase
(extract / score / merge / train-step) is timed explicitly and a trace can be
captured with ``jax.profiler`` for xprof.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class Timings:
    seconds: dict = field(default_factory=lambda: defaultdict(float))
    counts: dict = field(default_factory=lambda: defaultdict(int))

    def add(self, name: str, dt: float) -> None:
        self.seconds[name] += dt
        self.counts[name] += 1

    def summary(self) -> str:
        return " | ".join(
            f"{k}: {v:.3f}s/{self.counts[k]}x" for k, v in self.seconds.items()
        )


@contextlib.contextmanager
def phase_timer(timings: Timings, name: str, trace_dir: str | None = None):
    ctx = contextlib.nullcontext()
    if trace_dir:
        import jax

        ctx = jax.profiler.trace(trace_dir)
    t0 = time.perf_counter()
    with ctx:
        yield
    timings.add(name, time.perf_counter() - t0)
