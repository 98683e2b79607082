"""On-TPU pipeline-fed train-step benchmark: does the input path starve
the chip?

Compares ms/step of the SAME jitted train step under three feeds:

  synthetic  — one device-resident batch reused every step (the compute
               ceiling: zero host work, zero H2D)
  grain-raw  — the checkpointable Grain iterator consumed directly
               (host preprocessing overlaps via workers, but the H2D
               copy runs serially with the step — the pre-round-4 path)
  grain-ovl  — the same iterator through StatefulPrefetchIterator
               (H2D of batch N+1 overlaps step N; exact-resume
               preserved — the production path, train.py:550-565)

The VERDICT r3 next-#2 done-criterion is grain-ovl ~= synthetic.

Run manually on the TPU host:
    python scripts/tpu_pipeline_bench.py [--steps 30] [--batch 128]
        [--grain_workers 8]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:   # logic smoke-test off-TPU (env var is too late:
    jax.config.update("jax_platforms", "cpu")   # sitecustomize imports jax)

import jax.numpy as jnp
import numpy as np

from attentionalpoolingaction_tpu import train as train_lib
from attentionalpoolingaction_tpu.config import TrainConfig
from attentionalpoolingaction_tpu.data import grain_pipeline, pipeline
from attentionalpoolingaction_tpu.data.datasets import get_dataset
from attentionalpoolingaction_tpu.data.records import (
    write_synthetic_dataset)


def bench_feed(name, step_fn, host_state, batches, steps):
    """Time `steps` steps, one batch per step, D2H-synced (axon tunnel:
    block_until_ready alone can return early — fetch a scalar).  Takes a
    HOST state snapshot: the train step donates its state buffers, so
    each feed must start from fresh device arrays."""
    state = jax.tree.map(jnp.asarray, host_state)
    it = iter(batches)
    state, m = step_fn(state, next(it))
    float(m["loss/total"])                       # compile + sync
    for _ in range(3):
        state, m = step_fn(state, next(it))
    float(m["loss/total"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step_fn(state, next(it))
    float(m["loss/total"])
    dt = (time.perf_counter() - t0) / steps
    print(f"  {name:10s}: {dt * 1e3:7.1f} ms/step")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--grain_workers", type=int, default=8)
    ap.add_argument("--examples", type=int, default=1024)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (handled pre-parse)")
    args = ap.parse_args()
    print("backend:", jax.devices())

    cfg = TrainConfig(
        dataset="mpii", backbone="resnet_v1_101", pooling="attention",
        image_size=args.image_size, batch_size=args.batch,
        learning_rate=1e-3, grad_clip_norm=10.0, lr_schedule="constant",
        transfer_uint8=True, input_pipeline="grain",
        grain_workers=args.grain_workers)
    spec = get_dataset(cfg.dataset)

    d = tempfile.mkdtemp(prefix="tpu_pipeline_bench_")
    pattern = os.path.join(d, "train.tfrecord")
    # stored JPEGs a bit larger than the crop so decode+resize is real work
    write_synthetic_dataset(pattern, spec, args.examples,
                            image_size=args.image_size + 32)

    state, _, model, tx = train_lib.create_state(cfg)
    host_state = jax.device_get(state)
    del state
    step_fn = train_lib.make_train_step(model, spec, cfg, tx)

    def make_grain_iter():
        return grain_pipeline.make_train_iterator(
            pattern, spec, batch_size=cfg.batch_size,
            image_size=cfg.image_size, resize_min=cfg.resize_min_resolved,
            resize_max=cfg.resize_max_resolved, seed=0,
            num_workers=cfg.grain_workers, transfer_uint8=True)

    # feed 1: device-resident synthetic (ceiling).  Shapes/dtypes match
    # the uint8-transfer pipeline batch exactly.
    probe = next(make_grain_iter())
    dev_batch = jax.tree.map(jnp.asarray, probe)
    jax.block_until_ready(dev_batch)
    print(f"batch: { {k: (v.shape, str(v.dtype)) for k, v in probe.items()} }")

    print(f"B{args.batch} {args.image_size}px bf16 attention "
          f"(grain_workers={args.grain_workers}, uint8 transfer):")
    t_syn = bench_feed("synthetic", step_fn, host_state,
                       iter(lambda: dev_batch, None), args.steps)

    # feed 2: raw grain iterator — serial H2D (warm the worker pool first
    # so worker spin-up doesn't bill to the timed steps)
    raw = make_grain_iter()
    t_raw = bench_feed("grain-raw", step_fn, host_state, raw, args.steps)

    # feed 3: StatefulPrefetchIterator — overlapped H2D, exact resume
    ovl = pipeline.StatefulPrefetchIterator(make_grain_iter(), size=2)
    t_ovl = bench_feed("grain-ovl", step_fn, host_state, ovl, args.steps)

    print(f"overlap recovers {100 * (t_raw - t_ovl) / t_raw:.1f}% of the "
          f"raw pipeline's step time; grain-ovl is "
          f"{100 * t_ovl / t_syn - 100:+.1f}% vs the synthetic ceiling")


if __name__ == "__main__":
    main()
