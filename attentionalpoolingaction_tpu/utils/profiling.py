"""Tracing/profiling (SURVEY.md section 5 "Tracing/profiling" row):
jax.profiler integration (Perfetto/TensorBoard traces) + blocking step
timers for microbenches.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard's profile tab or
    Perfetto: ``with profiling.trace('/tmp/trace'): step()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def make_trace_hook(logdir: str, start_step: int, num_steps: int = 3,
                    last_step: int | None = None):
    """Train-loop hook (train_cli --trace_at_step): capture a device
    profile of ``num_steps`` steps once the loop reaches ``start_step``.
    The capture brackets real steps of the live run — input pipeline,
    H2D, and the fused step all appear in the timeline.

    ``last_step``: the run's final step (train_cli passes the resolved
    num_steps) — the trace is stopped there even if fewer than
    ``num_steps`` were captured, and an atexit fallback flushes a trace
    left open by any other early loop exit (the profile is only written
    on stop)."""
    import atexit

    state = {"on": False, "done": False}

    def _stop():
        if state["on"]:
            jax.profiler.stop_trace()
            state["on"] = False
            state["done"] = True

    atexit.register(_stop)

    def hook(step, train_state, metrics):
        del train_state, metrics
        if state["done"]:
            return
        if not state["on"] and step >= start_step:
            jax.profiler.start_trace(logdir)
            state["on"] = True
            state["stop_at"] = step + num_steps
        if state["on"] and (step >= state["stop_at"] or
                            (last_step is not None and step >= last_step)):
            _stop()

    return hook


def start_server(port: int = 9999):
    """Live profiler endpoint for `tensorboard --logdir` capture."""
    return jax.profiler.start_server(port)


def timed(fn, *args, warmup: int = 2, iters: int = 10, **kw):
    """Wall-clock a jitted callable with block_until_ready (per-dispatch
    timing — for in-graph repetition timing see scripts/tpu_checks.py)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


class StepTimer:
    """Rolling images/sec meter for the train loop."""

    def __init__(self, batch_size: int, window: int = 50):
        self.batch_size = batch_size
        self.window = window
        self._t = None
        self._times = []

    def tick(self):
        now = time.perf_counter()
        if self._t is not None:
            self._times.append(now - self._t)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._t = now

    @property
    def images_per_sec(self) -> float:
        if not self._times:
            return 0.0
        return self.batch_size / (sum(self._times) / len(self._times))
