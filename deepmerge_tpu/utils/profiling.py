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
    try:
        with ctx:
            yield
    finally:
        # record even when the phase raises — the wall-clock was consumed,
        # and error-path summaries should show where it went
        timings.add(name, time.perf_counter() - t0)


# ---------------------------------------------------------------------------
# Relay-safe device timing. On relayed TPU platforms a dispatch costs ~28ms
# and ``block_until_ready`` does not truly synchronize — only pulling a
# scalar does — so per-dispatch host timing lies. These helpers are the
# measurement discipline behind ROOFLINE.md / tools/perfprobe.py.
# ---------------------------------------------------------------------------


def sync_time(fn, *args, iters: int = 3) -> float:
    """Wall ms of one dispatch of a SCALAR-returning jitted fn.

    The scalar pull (`float()`) is the only reliable sync on relayed
    platforms; fn must reduce its real output (e.g. ``jnp.abs(out).sum()``
    — a plain sum lets XLA factor matmuls away and reports fantasy times).
    """
    float(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = float(fn(*args))  # noqa: F841 — the pull IS the sync
    return (time.perf_counter() - t0) / iters * 1000


def rep_probe(make_body, *args, k: int = 16) -> float:
    """Per-op ms via in-jit repetition: runs ``make_body(i, *args)`` K and
    2K times inside single programs and returns the slope, cancelling the
    dispatch/sync overhead. ``make_body`` must USE the loop counter ``i``
    to perturb its input NON-LINEARLY (e.g. ``jnp.maximum(x, i*1e-3)``) or
    XLA hoists the op out of the loop."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def loop(k_static):
        @jax.jit
        def f(*a):
            def body(i, acc):
                return acc + make_body(i, *a)

            return lax.fori_loop(0, k_static, body, jnp.float32(0.0))

        return f

    t1 = sync_time(loop(k), *args)
    t2 = sync_time(loop(2 * k), *args)
    return (t2 - t1) / k
