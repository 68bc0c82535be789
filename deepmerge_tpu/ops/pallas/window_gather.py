"""Pallas window-gather kernel: pipelined per-point HBM→HBM window DMA.

XLA lowers ``vmap(dynamic_slice)`` over per-sample offsets to a generic
gather, which is catastrophically slow on TPU (measured ~600ms for 1024
128²-pixel windows). A one-DMA-per-grid-step Pallas kernel is no better
(~4ms fixed overhead per program on this platform). The winning shape is a
SINGLE program that walks the point list with a ``fori_loop`` and keeps
``_INFLIGHT`` strided HBM→HBM copies outstanding — the DMA engines stream
the windows at memory bandwidth with no per-window program overhead.

Alignment: Mosaic requires DMA slice origins aligned to the dtype tiling
(uint8: 32 sublanes × 128 lanes), so callers align window origins DOWN to
the tile grid and gather a slightly larger window; the residual offset is
folded into the downstream resize weight matrices (which encode arbitrary
crops anyway — see ops/resize.py).

Layout: the scene is viewed 2-D as (H, W·C) uint8 so each window row is a
contiguous byte run. This is the "Pallas gather/slice kernel for in-HBM
multi-scale window extraction" planned in SURVEY.md §2.3. Falls back to
interpreter mode off TPU (tests run it on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_ALIGN = 32     # uint8 sublane tile
LANE_ALIGN = 128   # lane tile
_INFLIGHT = 8      # concurrent window DMAs


def _gather_kernel(starts_ref, scene_ref, out_ref, sems):
    """Single program: pipelined HBM→HBM window copies, _INFLIGHT deep."""
    n = starts_ref.shape[0]
    rows = out_ref.shape[1]
    cols = out_ref.shape[2]

    def get_dma(i):
        y0 = pl.multiple_of(starts_ref[i, 0], ROW_ALIGN)
        x0 = pl.multiple_of(starts_ref[i, 1], LANE_ALIGN)
        return pltpu.make_async_copy(
            scene_ref.at[pl.ds(y0, rows), pl.ds(x0, cols)],
            out_ref.at[i],
            sems.at[i % _INFLIGHT],
        )

    def body(i, _):
        @pl.when(i >= _INFLIGHT)
        def _():
            get_dma(i - _INFLIGHT).wait()  # free this semaphore slot

        get_dma(i).start()
        return 0

    jax.lax.fori_loop(0, n, body, 0, unroll=False)

    def drain(i, _):
        get_dma(i).wait()
        return 0

    jax.lax.fori_loop(max(n - _INFLIGHT, 0), n, drain, 0, unroll=False)


def gather_windows(scene2d, starts, rows: int, cols: int, interpret: bool = False):
    """Gather per-point aligned windows from an HBM-resident scene.

    Args:
      scene2d: (H, W·C) uint8 — channel-flattened scene rows.
      starts: (B, 2) int32 — per-point (row, elem-col) window origins; MUST
        be tile-aligned (row % 32 == 0, col % 128 == 0) and in-bounds.
        The alignment is a MOSAIC PROMISE (``pl.multiple_of``), not a
        runtime check: a misaligned origin gathers silently shifted
        content on a real TPU while interpret-mode tests still pass.
        Concrete (non-traced) inputs are therefore validated here at the
        jit boundary; traced callers must align (``ops/patches.py`` does).
      rows, cols: static window extent (rows % 32 == 0, cols % 128 == 0).
      interpret: run in interpreter mode (for CPU tests).

    Returns:
      (B, rows, cols) uint8 windows.
    """
    if not isinstance(starts, jax.core.Tracer):
        import numpy as np

        s = np.asarray(starts)
        if s.size and (
            np.any(s[:, 0] % ROW_ALIGN) or np.any(s[:, 1] % LANE_ALIGN)
        ):
            raise ValueError(
                "gather_windows: starts must be tile-aligned "
                f"(row % {ROW_ALIGN} == 0, col % {LANE_ALIGN} == 0) — "
                "align-down and widen the window like ops/patches.py does"
            )
    return _gather_windows_jit(scene2d, starts, rows, cols, interpret)


@functools.partial(jax.jit, static_argnames=("rows", "cols", "interpret"))
def _gather_windows_jit(scene2d, starts, rows: int, cols: int,
                        interpret: bool = False):
    assert rows % ROW_ALIGN == 0 and cols % LANE_ALIGN == 0, (rows, cols)
    b = starts.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_INFLIGHT,))],
    )
    return pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, rows, cols), jnp.uint8),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts.astype(jnp.int32), scene2d)


def default_interpret() -> bool:
    """Interpreter mode unless running on a real TPU backend."""
    try:
        return jax.default_backend() != "tpu"
    except Exception:  # pragma: no cover
        return True
