"""Profiling hooks — the TPU counterpart of QCDGPU's cl_event timing.

The reference's OpenCL wrapper records per-kernel start/end events and
prints aggregated kernel times into the results file (SURVEY.md §5.1).
On TPU the per-kernel timeline lives in an XLA/jax.profiler trace; this
module wraps trace capture (viewable in Perfetto/TensorBoard) and provides
the coarse per-phase wall-clock table that goes into the results record
(utils/report.py) — including the headline link-updates/s rate.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str | None):
    """Capture a jax.profiler trace into ``logdir`` (no-op when None).

    The trace contains every compiled kernel (the 8 stage kernels, the
    measurement reductions, reunitarization) with device timings — the
    fine-grained equivalent of the reference's per-kernel cl_event table.
    """
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Coarse per-phase wall-clock aggregation for the results record."""

    def __init__(self):
        self.phases: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def as_dict(self, round_to: int = 3) -> dict:
        return {k: round(v, round_to) for k, v in self.phases.items()}
