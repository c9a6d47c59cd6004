"""Tracing / profiling (SURVEY.md §5.1 — the reference has only wall-clock
prints around torch.cuda.synchronize; here: jax.profiler traces + a step timer
that synchronizes via host transfer, which works through remote-device tunnels
where block_until_ready can be a no-op)."""

from __future__ import annotations

import contextlib
import time

import numpy as np

import jax


def sync(tree):
    """Hard device sync: transfer one leaf to host (device executes in order)."""
    leaves = jax.tree.leaves(tree)
    if leaves:
        np.asarray(leaves[-1])
    return tree


class StepTimer:
    """Rolling per-step wall-clock stats (ref prints time/batch per iteration)."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        if len(self.times) > self.window:
            self.times.pop(0)

    @property
    def mean(self):
        return float(np.mean(self.times)) if self.times else 0.0

    @property
    def p50(self):
        return float(np.median(self.times)) if self.times else 0.0


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA/TPU profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9999):
    """Expose the on-demand profiling endpoint."""
    return jax.profiler.start_server(port)


def annotate(name: str):
    """Named region for traces (shows up in XProf timelines)."""
    return jax.profiler.TraceAnnotation(name)
