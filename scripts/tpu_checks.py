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


def timeit(fn, x, iters=100):
    """Per-op DEVICE time from the profiler's XLA-module clock.

    Methodology (hard-won — every simpler harness lied here):
      * host wall-clock per dispatch is useless through the axon tunnel
        (~30 ms RTT swamps sub-ms ops; round-1's 300-400 us/op numbers
        were mostly RTT divided by the iteration count);
      * an optimization_barrier-chained scan gets ELIMINATED whole by XLA
        (the carry is an identity => measured 1.6 us/iter, i.e. nothing);
      * so: chain iterations through a 1-element dynamic_update_slice on
        the loop-carried input (genuinely different input each iteration,
        ~zero added traffic) and read the module's total device time from
        a jax.profiler trace — host timing never enters the number.
    """
    import glob
    import shutil
    import tempfile

    @jax.jit
    def run(x):
        def body(carry, _):
            xc, acc = carry
            xc = jax.lax.dynamic_update_slice(
                xc, (acc * 1e-6).astype(xc.dtype).reshape((1,) * xc.ndim),
                (0,) * xc.ndim)
            out = fn(xc)
            return (xc, out[0, 0]), ()
        (_, acc), _ = jax.lax.scan(body, (x, jnp.float32(0)), None,
                                   length=iters)
        return acc

    float(np.asarray(run(x)))  # compile + warm
    tmp = tempfile.mkdtemp(prefix="tpu_checks_trace_")
    jax.profiler.start_trace(tmp)
    float(np.asarray(run(x)))
    jax.profiler.stop_trace()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    pb = sorted(glob.glob(f"{tmp}/plugins/profile/*/*.xplane.pb"))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(pb, "rb").read())
    total_ps = 0
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        emeta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Modules":
                continue
            for ev in line.events:
                if "jit_run" in emeta[ev.metadata_id].name:
                    total_ps += ev.duration_ps
    shutil.rmtree(tmp, ignore_errors=True)
    return total_ps / 1e12 / iters


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
