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


def test_trace_writes(tmp_path):
    import jax

    with profiling.trace(str(tmp_path)):
        jax.jit(lambda x: x + 1)(jnp.ones((8,))).block_until_ready()
    # jax profiler writes a plugins/profile dir
    assert any(tmp_path.rglob("*")), "no trace output written"
