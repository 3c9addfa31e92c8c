"""Profiling / tracing hooks (SURVEY §5: the reference has none beyond
docstring timing notes; the TPU-native plan is jax.profiler traces plus
per-stage wall timing).

Usage:
    with trace_if("/tmp/tb_traces", enabled=args.profile):
        for batch in loader:
            with annotate("train_step"):
                state, losses = step_fn(state, batch)

Traces are viewable in TensorBoard / Perfetto. ``StageTimer`` gives
coarse host-side wall timings with device sync for quick CLI printouts.
"""

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace_if(logdir: str, enabled: bool = True):
    """jax.profiler trace context (no-op when disabled)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the TPU trace timeline."""
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Host wall timing with device synchronization per stage."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        yield
        if sync_value is not None:
            jax.block_until_ready(sync_value)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> str:
        rows = [
            f"{k}: {self.totals[k] / max(self.counts[k], 1) * 1e3:.2f} ms avg"
            f" over {self.counts[k]}"
            for k in sorted(self.totals)
        ]
        return "\n".join(rows)
