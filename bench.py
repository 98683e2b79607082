"""Benchmark: ResNet-101 + rank-1 attentional-pooling inference throughput
(images/sec/chip) — BASELINE.json's north-star metric ("sustain >5x
A100-class images/sec/chip on v5e").

Runs on whatever backend `jax.devices()` provides (the driver runs it on the
real TPU chip).  bf16 backbone, f32 head accumulation, batch swept for best
throughput.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

vs_baseline: the reference published no throughput (SURVEY.md section 6), so
the baseline is the BASELINE.json target itself: 5x an A100-class ResNet-101
inference rate (~1300 img/s at 224px bf16/TF32 => target 6500 img/s);
vs_baseline = value / 6500.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from attentionalpoolingaction_tpu.models.factory import get_model

TARGET_IMG_S = 6500.0  # 5x A100-class (~1300 img/s) per BASELINE.json


def bench_forward(batch_size=256, image_size=224, steps=20, warmup=5,
                  use_pallas=False):  # flip to True once the Pallas kernel lands
    model = get_model("resnet_v1_101", num_classes=393, pooling="attention",
                      rank=1, dtype=jnp.bfloat16, use_pallas=use_pallas)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(batch_size, image_size, image_size, 3)),
        jnp.bfloat16)
    variables = model.init(jax.random.key(0), images[:1], train=False)

    @jax.jit
    def fwd(images):
        return model.apply(variables, images)["logits"]

    # sync via a D2H value fetch: through the axon tunnel,
    # block_until_ready alone can ack before device completion
    float(fwd(images)[0, 0])
    for _ in range(warmup):
        out = fwd(images)
    float(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fwd(images)
    float(out[0, 0])
    dt = time.perf_counter() - t0
    return batch_size * steps / dt


def bench_int8(batch_size=256, image_size=224, steps=20, warmup=5):
    """Quantized serving path (models/inference.py): BN-folded backbone,
    per-channel int8 weights, calibrated static activation scales.
    Measured 10,271 img/s at B256 on v5e (1.28x bf16) with logit cosine
    0.9999 vs the bf16 forward (scripts/tpu_int8_bench.py)."""
    from attentionalpoolingaction_tpu.models import inference as inf

    model = get_model("resnet_v1_101", num_classes=393, pooling="attention",
                      rank=1, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(batch_size, image_size, image_size, 3)),
        jnp.bfloat16)
    variables = model.init(jax.random.key(0), images[:1], train=False)
    folded = inf.fold_backbone(variables, "resnet_v1_101")
    head = variables["params"]["head"]
    act_scales = inf.calibrate_act_scales(
        folded, head, [np.asarray(images[:8], np.float32)],
        backbone="resnet_v1_101")
    q = inf.quantize_folded(folded)

    @jax.jit
    def fwd(images):
        return inf.folded_forward(q, head, images, act_scales=act_scales,
                                  dtype=jnp.bfloat16)["logits"]

    float(fwd(images)[0, 0])  # compile + D2H sync (see bench_forward)
    for _ in range(warmup):
        out = fwd(images)
    float(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fwd(images)
    float(out[0, 0])
    return batch_size * steps / (time.perf_counter() - t0)


def bench_train(batch_size=128, image_size=224, steps=20):
    """Full train step (fwd + bwd + clip + SGD + BN stat updates) on the
    MPII ResNet-101 rank-1 config — the reference's actual workload.
    HBM-bandwidth-bound on v5e (see ARCHITECTURE.md roofline)."""
    from attentionalpoolingaction_tpu import train as train_lib
    from attentionalpoolingaction_tpu.config import TrainConfig
    from attentionalpoolingaction_tpu.data.datasets import get_dataset

    cfg = TrainConfig(dataset="mpii", backbone="resnet_v1_101",
                      pooling="attention", image_size=image_size,
                      batch_size=batch_size, learning_rate=1e-3,
                      grad_clip_norm=10.0, lr_schedule="constant")
    spec = get_dataset(cfg.dataset)
    state, _, model, tx = train_lib.create_state(cfg)
    step_fn = train_lib.make_train_step(model, spec, cfg, tx)
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(
            size=(batch_size, image_size, image_size, 3)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, spec.num_classes, batch_size),
                             jnp.int32),
        "transform": jnp.tile(jnp.asarray([1., 1., 0., 0., 0.]),
                              (batch_size, 1)),
    }
    state, m = step_fn(state, batch)
    float(m["loss/total"])  # D2H sync (see bench_forward)
    for _ in range(3):
        state, m = step_fn(state, batch)
    float(m["loss/total"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step_fn(state, batch)
    float(m["loss/total"])
    dt = time.perf_counter() - t0
    return batch_size * steps / dt


def main():
    platform = jax.devices()[0].platform
    best = 0.0
    best_bs = 0
    # b512 measured best on v5e (b256 ~9000, b1024 7338 img/s); one size
    # keeps the driver's bench run short
    sizes = [512] if platform != "cpu" else [8]
    for bs in sizes:
        try:
            rate = bench_forward(batch_size=bs)
        except Exception:
            continue
        if rate > best:
            best, best_bs = rate, bs
    try:
        train_rate = bench_train(
            batch_size=128 if platform != "cpu" else 4)
    except Exception:
        import traceback
        traceback.print_exc()  # keep the JSON line clean, lose nothing
        train_rate = None
    try:
        int8_rate = bench_int8(
            batch_size=256 if platform != "cpu" else 8)
    except Exception:
        import traceback
        traceback.print_exc()
        int8_rate = None
    print(json.dumps({
        "metric": "resnet101_attnpool_fwd_images_per_sec_per_chip"
                  f"_224px_bf16_b{best_bs}_{platform}",
        "value": round(best, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(best / TARGET_IMG_S, 3),
        # the reference's actual workload (fwd+bwd+SGD, BN updating),
        # B128 224px bf16 — tracked per round alongside the inference
        # north-star (VERDICT r1 "What's weak" #1)
        "train_images_per_sec_per_chip":
            round(train_rate, 1) if train_rate else None,
        # quantized serving path (BN-folded + per-channel int8, B256) —
        # 1.28x the bf16 forward on v5e, logit-cos 0.9999
        "int8_images_per_sec_per_chip":
            round(int8_rate, 1) if int8_rate else None,
    }))


if __name__ == "__main__":
    main()
