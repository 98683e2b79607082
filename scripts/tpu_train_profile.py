"""Decompose the B128 224px ResNet-101 train step on the real chip:
where do the ~63 ms go?  (VERDICT r1 "Next round" #1.)

Times a ladder of program variants, each isolating one component:
  fwd-infer        forward, eval-mode BN (the bench.py number)
  fwd-train        forward with batch-stat updates
  fwd-loss         + softmax CE
  grad             value_and_grad, no optimizer
  grad-noclip      ... optimizer without clip-by-global-norm
  full             the real train step (clip + SGD + metrics)
  full-freezebn    the real step with freeze_bn=True
  full-b256        batch scaling check

Run: python scripts/tpu_train_profile.py [--steps 20] [--trace DIR]
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


def timeit(fn, fetch, steps):
    out = fn()
    float(fetch(out))          # D2H sync (tunnel-safe)
    for _ in range(3):
        out = fn()
    float(fetch(out))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn()
    float(fetch(out))
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--trace", type=str, default=None)
    args = ap.parse_args()
    print("backend:", jax.devices())

    cfg = TrainConfig(dataset="mpii", backbone="resnet_v1_101",
                      pooling="attention", image_size=224,
                      batch_size=args.batch, learning_rate=1e-3,
                      grad_clip_norm=10.0, lr_schedule="constant")
    spec = get_dataset(cfg.dataset)
    state, _, model, tx = train_lib.create_state(cfg)
    rng = np.random.default_rng(0)
    b = cfg.batch_size
    images = jnp.asarray(rng.normal(size=(b, 224, 224, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, spec.num_classes, b), jnp.int32)
    batch = {"image": images, "label": labels,
             "transform": jnp.tile(jnp.asarray([1., 1., 0., 0., 0.]),
                                   (b, 1))}
    loss_fn = train_lib.make_loss_fn(model, spec, cfg)

    results = {}

    @jax.jit
    def fwd_infer(params, stats, images):
        return model.apply({"params": params, "batch_stats": stats},
                           images)["logits"]

    dt = timeit(lambda: fwd_infer(state.params, state.batch_stats, images),
                lambda o: o[0, 0], args.steps)
    results["fwd-infer"] = dt

    @jax.jit
    def fwd_train(params, stats, images):
        out, upd = model.apply({"params": params, "batch_stats": stats},
                               images, train=True,
                               mutable=["batch_stats"])
        return out["logits"]

    dt = timeit(lambda: fwd_train(state.params, state.batch_stats, images),
                lambda o: o[0, 0], args.steps)
    results["fwd-train"] = dt

    @jax.jit
    def fwd_loss(params, stats, batch):
        loss, _ = loss_fn(params, stats, batch, True)
        return loss

    dt = timeit(lambda: fwd_loss(state.params, state.batch_stats, batch),
                float, args.steps)
    results["fwd-loss"] = dt

    import optax

    @jax.jit
    def grad_only(params, stats, batch):
        g = jax.grad(lambda p: loss_fn(p, stats, batch, True)[0])(params)
        # reduce over EVERY leaf — anything less lets XLA dead-code-
        # eliminate the unused parts of the backward
        return optax.global_norm(g)

    dt = timeit(lambda: grad_only(state.params, state.batch_stats, batch),
                float, args.steps)
    results["grad"] = dt

    # gradients + plain SGD(momentum), no weight decay / clip / metrics
    sgd = optax.sgd(1e-3, momentum=0.9)
    sgd_state = jax.jit(sgd.init)(state.params)

    @jax.jit
    def grad_sgd(params, stats, opt_state, batch):
        g = jax.grad(lambda p: loss_fn(p, stats, batch, True)[0])(params)
        upd, new_opt = sgd.update(g, opt_state, params)
        return optax.apply_updates(params, upd), new_opt

    boxp = {"p": state.params, "o": sgd_state}

    def run_gs():
        boxp["p"], boxp["o"] = grad_sgd(boxp["p"], state.batch_stats,
                                        boxp["o"], batch)
        return boxp["p"]

    results["grad+sgd"] = timeit(
        run_gs, lambda p: jax.tree.leaves(p)[0].ravel()[0], args.steps)

    # full step without clip
    import dataclasses
    cfg_noclip = dataclasses.replace(cfg, grad_clip_norm=None)
    tx_nc = train_lib.make_optimizer(cfg_noclip)
    state_nc, *_ = train_lib.create_state(cfg_noclip)
    step_nc = train_lib.make_train_step(model, spec, cfg_noclip, tx_nc)

    class Box:
        pass

    box = Box()
    box.state = state_nc

    def run_nc():
        box.state, m = step_nc(box.state, batch)
        return m

    results["full-noclip"] = timeit(
        run_nc, lambda m: m["loss/total"], args.steps)

    # the real full step
    step_fn = train_lib.make_train_step(model, spec, cfg, tx)
    box2 = Box()
    box2.state = state

    def run_full():
        box2.state, m = step_fn(box2.state, batch)
        return m

    results["full"] = timeit(run_full, lambda m: m["loss/total"],
                             args.steps)

    if args.trace:
        from attentionalpoolingaction_tpu.utils import profiling
        with profiling.trace(args.trace):
            for _ in range(3):
                box2.state, m = step_fn(box2.state, batch)
            float(m["loss/total"])
        print("trace written to", args.trace)

    # freeze_bn variant
    cfg_fb = dataclasses.replace(cfg, freeze_bn=True)
    tx_fb = train_lib.make_optimizer(cfg_fb)
    state_fb, *_ = train_lib.create_state(cfg_fb)
    step_fb = train_lib.make_train_step(model, spec, cfg_fb, tx_fb)
    box3 = Box()
    box3.state = state_fb

    def run_fb():
        box3.state, m = step_fb(box3.state, batch)
        return m

    results["full-freezebn"] = timeit(run_fb, lambda m: m["loss/total"],
                                      args.steps)

    print()
    base = results["full"]
    for name, dt in results.items():
        print(f"{name:16s} {dt*1e3:8.2f} ms   {args.batch/dt:8.0f} img/s"
              f"   {dt/base*100:5.1f}% of full")


if __name__ == "__main__":
    main()
