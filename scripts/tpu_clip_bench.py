"""On-TPU throughput of the clip-level spatiotemporal pooling mode.

Answers: what does clip mode cost vs the same number of independent
frames?  The backbone work is identical (T folds into the conv batch);
the only delta is the head pooling over T*h*w positions instead of T
separate h*w poolings — expected to be ~free (the head is ~2% of the
forward), making per-video predictions cheaper than T per-frame
requests + host-side averaging.

Reports, at 224px bf16:
  * frame-equivalent forward img/s: clip (B=64, T=8) vs flat (B=512)
  * clip-mode train step img/s (B=16, T=8 -> 128 frames/step)

Run manually, ONE JAX process at a time (see .claude/skills/verify);
sync via D2H fetch, never bare block_until_ready (axon tunnel).
    python scripts/tpu_clip_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from attentionalpoolingaction_tpu.models.factory import get_model


def _throughput(fwd, x, frames, steps=10, warmup=3):
    float(jnp.ravel(fwd(x))[0])
    for _ in range(warmup):
        out = fwd(x)
    float(jnp.ravel(out)[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fwd(x)
    float(jnp.ravel(out)[0])
    return frames * steps / (time.perf_counter() - t0)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    model = get_model("resnet_v1_101", num_classes=51,
                      pooling="attention", rank=1, dtype=jnp.bfloat16)

    b, t, size = 64, 8, 224
    clip = jnp.asarray(rng.normal(size=(b, t, size, size, 3)),
                       jnp.bfloat16)
    flat = clip.reshape(b * t, size, size, 3)
    variables = model.init(jax.random.key(0), flat[:1], train=False)

    @jax.jit
    def fwd(x):
        return model.apply(variables, x)["logits"]

    r_flat = _throughput(fwd, flat, b * t)
    r_clip = _throughput(fwd, clip, b * t)
    print(f"flat  B={b*t}: {r_flat:,.0f} frames/s")
    print(f"clip  B={b} T={t}: {r_clip:,.0f} frames/s "
          f"({r_clip / r_flat:.3f}x flat)")

    # clip train step (the hmdb51_clip8 recipe at scale)
    from attentionalpoolingaction_tpu import train as train_lib
    from attentionalpoolingaction_tpu.config import TrainConfig
    from attentionalpoolingaction_tpu.data.datasets import get_dataset

    bt = 16
    cfg = TrainConfig(dataset="hmdb51", backbone="resnet_v1_101",
                      pooling="attention", image_size=size,
                      batch_size=bt, clip_frames=t, learning_rate=1e-3,
                      grad_clip_norm=10.0, lr_schedule="constant",
                      freeze_bn=True, input_pipeline="grain")
    spec = get_dataset(cfg.dataset)
    state, _, m, tx = train_lib.create_state(cfg)
    step_fn = train_lib.make_train_step(m, spec, cfg, tx)
    batch = {
        "image": jnp.asarray(rng.normal(size=(bt, t, size, size, 3)),
                             jnp.float32),
        "label": jnp.asarray(rng.integers(0, 51, bt), jnp.int32),
        "transform": jnp.tile(jnp.asarray([1., 1., 0., 0., 0.]),
                              (bt, 1)),
    }
    state, mets = step_fn(state, batch)
    float(mets["loss/total"])
    for _ in range(3):
        state, mets = step_fn(state, batch)
    float(mets["loss/total"])
    steps = 10
    t0 = time.perf_counter()
    for _ in range(steps):
        state, mets = step_fn(state, batch)
    float(mets["loss/total"])
    r = bt * t * steps / (time.perf_counter() - t0)
    print(f"clip train B={bt} T={t} (freeze_bn): {r:,.0f} frames/s "
          f"({r / t:,.0f} videos/s)")


if __name__ == "__main__":
    main()
