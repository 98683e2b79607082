"""On-TPU train-step and end-to-end throughput benchmarks.

Run manually: python scripts/tpu_train_bench.py [--steps 30]
Covers: bf16 ResNet-101 train step (fwd+bwd+SGD) at MPII/HICO scales,
pose-attention variant (on-device heatmap rendering), and input-pipeline
overlap (tf.data synthetic feed vs. device-only repeat).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from attentionalpoolingaction_tpu import train as train_lib
from attentionalpoolingaction_tpu.config import TrainConfig
from attentionalpoolingaction_tpu.data.datasets import get_dataset


def make_batch(cfg, spec, rng, with_pose):
    b = cfg.batch_size
    batch = {
        "image": rng.normal(size=(b, cfg.image_size, cfg.image_size, 3)
                            ).astype(np.float32),
        "transform": np.tile(np.array([1, 1, 0, 0, 0], np.float32), (b, 1)),
    }
    if spec.multi_label:
        batch["label"] = (rng.random((b, spec.num_classes)) > 0.95
                          ).astype(np.float32)
    else:
        batch["label"] = rng.integers(0, spec.num_classes, b).astype(
            np.int32)
    if with_pose:
        batch["keypoints"] = rng.uniform(
            0, cfg.image_size, (b, 16, 2)).astype(np.float32)
        batch["visibility"] = np.ones((b, 16), np.float32)
    return batch


def bench_config(name, cfg, steps):
    spec = get_dataset(cfg.dataset)
    state, _, model, tx = train_lib.create_state(cfg)
    step_fn = train_lib.make_train_step(model, spec, cfg, tx)
    rng = np.random.default_rng(0)
    batch = jax.tree.map(jnp.asarray, make_batch(
        cfg, spec, rng, cfg.pooling == "pose_attention"))

    state, m = step_fn(state, batch)   # compile
    float(m["loss/total"])
    for _ in range(3):
        state, m = step_fn(state, batch)
    # D2H fetch = reliable sync through the axon tunnel
    float(m["loss/total"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step_fn(state, batch)
    float(m["loss/total"])
    dt = (time.perf_counter() - t0) / steps
    rate = cfg.batch_size / dt
    print(f"{name}: {dt*1e3:.1f} ms/step, {rate:.0f} img/s/chip "
          f"(B{cfg.batch_size} {cfg.image_size}px "
          f"{'bf16' if cfg.bf16_backbone else 'f32'} {cfg.pooling})")
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()
    print("backend:", jax.devices())

    common = dict(backbone="resnet_v1_101", learning_rate=1e-3,
                  grad_clip_norm=10.0, lr_schedule="constant")
    bench_config("mpii-224-rank1-train", TrainConfig(
        dataset="mpii", pooling="attention", image_size=224, batch_size=128,
        **common), args.steps)
    bench_config("mpii-224-pose-train", TrainConfig(
        dataset="mpii", pooling="pose_attention", image_size=224,
        batch_size=128, **common), args.steps)
    bench_config("hico-448-rank1-train", TrainConfig(
        dataset="hico", pooling="attention", image_size=448, batch_size=32,
        **common), args.steps)
    bench_config("mpii-450-rank5-train", TrainConfig(
        dataset="mpii", pooling="attention", rank=5, image_size=450,
        batch_size=32, **common), args.steps)


if __name__ == "__main__":
    main()
