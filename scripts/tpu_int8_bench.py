"""On-TPU benchmark of the int8 serving path vs the bf16 forward.

Answers two questions on the real chip:
  1. does an int8 conv actually beat bf16 through XLA:TPU (MXU int8 path)?
  2. end-to-end: img/s of the quantized BN-folded forward vs the standard
     bf16 `ActionModel.apply` forward, same batch/size.

Run manually, ONE JAX process at a time (see .claude/skills/verify):
    python scripts/tpu_int8_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from attentionalpoolingaction_tpu.models import inference as inf
from attentionalpoolingaction_tpu.models.action_model import ActionModel
from tpu_checks import timeit  # device-time harness (xplane clock)


def conv_microbench():
    """Block3-scale 3x3 conv (the backbone's dominant shape at 224px)."""
    rng = np.random.default_rng(0)
    for (b, hw, cin, cout) in [(128, 14, 256, 256), (128, 28, 128, 128),
                               (128, 14, 1024, 256)]:
        k = 3 if cin == cout else 1
        x8 = jnp.asarray(
            rng.integers(-127, 127, (b, hw, hw, cin)), jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 127, (k, k, cin, cout)),
                         jnp.int8)
        xb = x8.astype(jnp.bfloat16)
        wb = w8.astype(jnp.bfloat16)

        def conv_i8(x, w=w8):
            return lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO",
                                                         "NHWC"),
                preferred_element_type=jnp.int32)

        def conv_bf(x, w=wb):
            return lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO",
                                                         "NHWC"),
                preferred_element_type=jnp.float32)

        # timeit carries out[0,0]; a bare output slice lets XLA narrow the
        # conv to that window (measured "1us" convs — dead-code
        # elimination), so reduce the FULL output into the carried value
        t8 = timeit(lambda x: jnp.sum(conv_i8(x)).reshape(1, 1)
                    .astype(jnp.float32), x8, iters=50)
        tb = timeit(lambda x: jnp.sum(conv_bf(x).astype(jnp.float32))
                    .reshape(1, 1), xb, iters=50)
        print(f"conv {k}x{k} B{b} {hw}x{hw}x{cin}->{cout}: "
              f"int8={t8*1e6:.0f}us bf16={tb*1e6:.0f}us "
              f"speedup={tb/max(t8,1e-12):.2f}x")


def fwd_rate(fn, images, steps=20, warmup=5):
    out = fn(images)
    float(np.asarray(out)[0, 0] if hasattr(out, "shape") else out)
    for _ in range(warmup):
        out = fn(images)
    float(np.asarray(out)[0, 0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(images)
    float(np.asarray(out)[0, 0])
    return images.shape[0] * steps / (time.perf_counter() - t0)


def end_to_end(batch_size=512, image_size=224):
    model = ActionModel(num_classes=393, backbone="resnet_v1_101",
                        pooling="attention", rank=1, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(batch_size, image_size, image_size, 3)),
        jnp.bfloat16)
    variables = model.init(jax.random.key(0), images[:1], train=False)

    @jax.jit
    def bf16_fwd(images):
        return model.apply(variables, images)["logits"]

    folded = inf.fold_backbone(variables, "resnet_v1_101")
    head = variables["params"]["head"]
    act_scales = inf.calibrate_act_scales(
        folded, head, [np.asarray(images[:8], np.float32)],
        backbone="resnet_v1_101")
    q = inf.quantize_folded(folded)

    @jax.jit
    def int8_fwd(images):
        return inf.folded_forward(q, head, images, act_scales=act_scales,
                                  dtype=jnp.bfloat16)["logits"]

    @jax.jit
    def folded_bf16_fwd(images):
        return inf.folded_forward(folded, head, images,
                                  dtype=jnp.bfloat16)["logits"]

    r_bf = fwd_rate(bf16_fwd, images)
    r_fold = fwd_rate(folded_bf16_fwd, images)
    r_i8 = fwd_rate(int8_fwd, images)
    # numeric sanity on-device
    a = np.asarray(int8_fwd(images[:16]), np.float64).ravel()
    b = np.asarray(bf16_fwd(images[:16]), np.float64).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    print(f"B{batch_size} {image_size}px: bf16={r_bf:.0f} img/s  "
          f"folded-bf16={r_fold:.0f} img/s  int8={r_i8:.0f} img/s  "
          f"(int8 {r_i8/r_bf:.2f}x)  logit-cos={cos:.4f}")


def main():
    print("backend:", jax.default_backend(), jax.devices())
    conv_microbench()
    for bs in (256, 512, 1024):
        end_to_end(batch_size=bs)


if __name__ == "__main__":
    main()
