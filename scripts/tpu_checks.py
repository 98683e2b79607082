"""On-TPU validation + microbench of the fused Pallas pooling kernel.

Run manually (one JAX process at a time — see .claude/skills/verify):
    python scripts/tpu_checks.py
Compares compiled-Mosaic output against the factorized einsum path on the
real chip, then times head-only and full-model forward variants.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from attentionalpoolingaction_tpu.ops.attn_pool import (
    attentional_pool, init_attn_pool_params)
from attentionalpoolingaction_tpu.ops.attn_pool_pallas import (
    attentional_pool_fused)


def timeit(fn, x, iters=100, reps=3):
    """Per-op device time: run ``iters`` sequentially-dependent calls inside
    one jit (a single dispatch — the axon tunnel's per-call RTT would
    otherwise dominate the measurement)."""
    @jax.jit
    def run(x):
        def body(c, _):
            out = fn(c)
            # serialize iterations without touching the data (a carry
            # arithmetic on x would add a full X read+write per iter)
            c2, _ = jax.lax.optimization_barrier((c, out))
            return c2, ()
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c

    def sync(out):
        # one-element D2H fetch: reliable completion sync through the axon
        # tunnel (block_until_ready can ack early) without shipping the
        # whole array over the relay
        return float(out.reshape(-1)[0])

    sync(run(x))  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(run(x))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)
    # HICO-scale head: N=196 (448px), F=2048, C=600, rank 1 and 5
    for (b, n, f, c, p) in [(64, 196, 2048, 600, 1), (64, 196, 2048, 600, 5),
                            (256, 49, 2048, 393, 1)]:
        x = jnp.asarray(rng.normal(size=(b, n, f)), jnp.bfloat16)
        params = init_attn_pool_params(jax.random.key(0), f, c, p)

        fused = jax.jit(lambda x: attentional_pool_fused(
            x, params["attn_w"], params["attn_b"], params["sal_w"],
            params["sal_b"], False))
        ref = jax.jit(lambda x: attentional_pool(x, **params))

        got = np.asarray(fused(x))
        want = np.asarray(ref(x))
        scale = np.abs(want).max()
        err = np.abs(got - want).max() / scale
        t_fused = timeit(fused, x)
        t_ref = timeit(ref, x)
        print(f"B{b} N{n} F{f} C{c} P{p}: rel_err={err:.2e} "
              f"fused={t_fused*1e6:.0f}us einsum={t_ref*1e6:.0f}us "
              f"speedup={t_ref/t_fused:.2f}x")
        assert err < 5e-2, "compiled kernel mismatch"
    print("TPU kernel checks OK")


if __name__ == "__main__":
    main()
