"""Profiling utilities."""

import time

import jax.numpy as jnp

from attentionalpoolingaction_tpu.utils import profiling


def test_step_timer():
    t = profiling.StepTimer(batch_size=10, window=3)
    assert t.images_per_sec == 0.0
    for _ in range(4):
        t.tick()
        time.sleep(0.01)
    assert t.images_per_sec > 0
    assert len(t._times) <= 3


def test_timed_callable():
    import jax

    f = jax.jit(lambda x: x * 2)
    dt = profiling.timed(f, jnp.ones((4,)), warmup=1, iters=3)
    assert dt > 0


def test_trace_hook(tmp_path):
    """train_cli --trace_at_step: captures exactly one window and writes
    the profile next to the workdir."""
    import jax

    hook = profiling.make_trace_hook(str(tmp_path), start_step=3,
                                     num_steps=2)
    for step in range(1, 8):
        jax.jit(lambda x: x * 2)(jnp.ones((4,))).block_until_ready()
        hook(step, None, None)
    assert any(tmp_path.rglob("*.xplane.pb")), "no profile written"
    # idempotent after the capture window (no second start_trace crash)
    hook(9, None, None)


def test_trace_writes(tmp_path):
    import jax

    with profiling.trace(str(tmp_path)):
        jax.jit(lambda x: x + 1)(jnp.ones((8,))).block_until_ready()
    # jax profiler writes a plugins/profile dir
    assert any(tmp_path.rglob("*")), "no trace output written"


def test_trace_hook_stops_at_last_step(tmp_path):
    """A run ending before the capture window completes still writes the
    profile (stop fires at last_step instead of losing the capture)."""
    import jax

    hook = profiling.make_trace_hook(str(tmp_path), start_step=4,
                                     num_steps=10, last_step=5)
    for step in range(1, 6):  # loop ends at step 5 < 4+10
        jax.jit(lambda x: x + 1)(jnp.ones((4,))).block_until_ready()
        hook(step, None, None)
    assert any(tmp_path.rglob("*.xplane.pb")), "early-exit capture lost"
