"""Train-step layout/traffic experiments on the real chip (VERDICT r2
next #8: "attempt the 4.2 ms layout-copy phase (conv dimension-order/
layout experiments); keep the honest roofline framing").

The round-2 xplane decomposition of the B128 224px bf16 train step
(scripts/tpu_train_profile.py):  convolution fusions 46.5 ms at 91% of
HBM peak, BN loop fusions 8.8 ms, layout copies 4.2 ms, rest ~2.4 ms.
This script times the candidate levers end-to-end:

  base          the protocol-faithful step (BN updating, f32 input)
  uint8-input   the REAL pipeline dtype (uint8 ship + on-device norm)
  no-gradnorm   drop the metrics-only global_norm pass over the grads
  auto-layout   jit with AUTO input/output layouts on the train state —
                lets XLA pick parameter layouts the convs want, removing
                entry/exit copies if the default (row-major) disagrees
  b192/b256     batch scaling (amortize fixed per-step cost)
  freeze-bn     context row (the fine-tune recipe; presets default)

Run: python scripts/tpu_layout_experiments.py [--steps 20]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from attentionalpoolingaction_tpu import train as train_lib
from attentionalpoolingaction_tpu.config import TrainConfig
from attentionalpoolingaction_tpu.data.datasets import get_dataset


def make_cfg(batch, **kw):
    return TrainConfig(dataset="mpii", backbone="resnet_v1_101",
                       pooling="attention", image_size=224,
                       batch_size=batch, learning_rate=1e-3,
                       grad_clip_norm=10.0, lr_schedule="constant", **kw)


def make_batch(cfg, spec, uint8=False):
    rng = np.random.default_rng(0)
    b = cfg.batch_size
    if uint8:
        img = rng.integers(0, 255, (b, 224, 224, 3)).astype(np.uint8)
    else:
        img = rng.normal(size=(b, 224, 224, 3)).astype(np.float32)
    return {
        "image": jnp.asarray(img),
        "label": jnp.asarray(rng.integers(0, spec.num_classes, b),
                             jnp.int32),
        "transform": jnp.tile(jnp.asarray([1., 1., 0., 0., 0.]), (b, 1)),
    }


def time_step(step_fn, state, batch, steps):
    box = {"s": state}

    def run():
        box["s"], m = step_fn(box["s"], batch)
        return m

    m = run()
    float(m["loss/total"])        # D2H sync (tunnel-safe)
    for _ in range(3):
        m = run()
    float(m["loss/total"])
    t0 = time.perf_counter()
    for _ in range(steps):
        m = run()
    float(m["loss/total"])
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()
    print("backend:", jax.devices())
    results = {}

    def report(name, dt, batch):
        results[name] = (dt, batch / dt)
        print(f"{name:14s} {dt*1e3:7.2f} ms/step  {batch/dt:7.0f} img/s")

    spec = get_dataset("mpii")

    # --- base, batch scaling, freeze_bn -------------------------------
    for name, b, kw in (("base", 128, {}), ("b192", 192, {}),
                        ("b256", 256, {}),
                        ("freeze-bn", 128, {"freeze_bn": True})):
        cfg = make_cfg(b, **kw)
        state, _, model, tx = train_lib.create_state(cfg)
        step = train_lib.make_train_step(model, spec, cfg, tx)
        dt = time_step(step, state, make_batch(cfg, spec), args.steps)
        report(name, dt, b)
        del state

    # --- uint8 input (the real pipeline ships uint8) ------------------
    cfg = make_cfg(128)
    state, _, model, tx = train_lib.create_state(cfg)
    step = train_lib.make_train_step(model, spec, cfg, tx)
    dt = time_step(step, state, make_batch(cfg, spec, uint8=True),
                   args.steps)
    report("uint8-input", dt, 128)
    del state

    # --- drop the metrics-only grad-norm pass -------------------------
    cfg = make_cfg(128)
    state, _, model, tx = train_lib.create_state(cfg)
    loss_fn = train_lib.make_loss_fn(model, spec, cfg)

    @jax.jit
    def step_nogn(state, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_stats, metrics)), grads = grad_fn(
            state.params, state.batch_stats, batch, True)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return train_lib.TrainState(
            step=state.step + 1, params=new_params, batch_stats=new_stats,
            opt_state=new_opt), metrics

    dt = time_step(step_nogn, state, make_batch(cfg, spec), args.steps)
    report("no-gradnorm", dt, 128)
    del state

    # --- AUTO layouts on the train state ------------------------------
    from jax.experimental.layout import Format, Layout

    cfg = make_cfg(128)
    state, _, model, tx = train_lib.create_state(cfg)
    step = train_lib.make_train_step(model, spec, cfg, tx)
    batch = make_batch(cfg, spec)
    auto = Format(Layout.AUTO)
    st_auto = jax.tree.map(lambda _: auto, state)

    def raw_step(state, batch):
        grad_fn = jax.value_and_grad(
            train_lib.make_loss_fn(model, spec, cfg), has_aux=True)
        (_, (new_stats, metrics)), grads = grad_fn(
            state.params, state.batch_stats, batch, True)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return train_lib.TrainState(
            step=state.step + 1, params=new_params, batch_stats=new_stats,
            opt_state=new_opt), metrics

    try:
        jf = jax.jit(raw_step,
                     in_shardings=(st_auto, None),
                     out_shardings=(st_auto, None),
                     donate_argnums=(0,))
        compiled = jf.lower(state, batch).compile()
        in_fmt = compiled.input_formats[0][0]
        # place the state in the layouts the compiled program wants
        state_l = jax.tree.map(
            lambda x, f: jax.device_put(x, f), state, in_fmt)
        n_nondefault = sum(
            1 for f in jax.tree.leaves(in_fmt)
            if tuple(f.layout.major_to_minor) !=
            tuple(range(len(f.layout.major_to_minor))))
        print(f"auto-layout: {n_nondefault} of "
              f"{len(jax.tree.leaves(in_fmt))} state leaves get a "
              "non-row-major layout")
        dt = time_step(compiled, state_l, batch, args.steps)
        report("auto-layout", dt, 128)
    except Exception as e:
        print("auto-layout experiment failed:", type(e).__name__, e)

    base = results.get("base", (None,))[0]
    if base:
        print("\nvs base:")
        for name, (dt, rate) in results.items():
            print(f"  {name:14s} {base/dt:5.3f}x")


if __name__ == "__main__":
    main()
