"""Inference-forward optimization experiments (run after
tpu_fwd_profile.py says where the time goes).

Candidates measured on the real chip with the device-clock harness
(scripts/tpu_checks.py::timeit — host clocks lie through the tunnel):

  1. conv1 space-to-depth: the 7x7/s2 stem conv on (H,W,3) wastes MXU
     lanes (3 input channels pad to the 128-lane tile).  The classic TPU
     transform: pad 3px, space-to-depth 2x2 -> (H/2+3, W/2+3, 12), and
     run the EXACT same linear map as a 4x4/s1 VALID conv whose kernel is
     the zero-padded 7x7 reshuffled.  Bit-exact in f32 (checked below).
  2. int8 handoff: today's int8 serving path quantizes at each conv's
     INPUT (consumer side), so inter-conv activations can cross HBM as
     bf16.  Probe a 2-conv chain with consumer-side vs producer-side
     (epilogue) quantization to see if int8-in-HBM handoff is worth a
     folded_forward restructure.

Run manually, ONE JAX process at a time (see .claude/skills/verify):
    python scripts/tpu_fwd_experiments.py [--cpu_check_only]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def conv1_same(x, k, stride=2):
    """The stem conv as models/resnet.py runs it (slim conv2d_same)."""
    pad = k.shape[0] - 1
    x = jnp.pad(x, [(0, 0), (pad // 2, pad - pad // 2),
                    (pad // 2, pad - pad // 2), (0, 0)])
    return lax.conv_general_dilated(x, k, (stride, stride), "VALID",
                                    dimension_numbers=_DN)


def s2d_kernel(k):
    """(7,7,C,O) stem kernel -> (4,4,4C,O) space-to-depth kernel."""
    c, o = k.shape[2], k.shape[3]
    k8 = jnp.pad(k, [(0, 1), (0, 1), (0, 0), (0, 0)])       # zero row/col
    return (k8.reshape(4, 2, 4, 2, c, o)
            .transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, o))


def conv1_s2d(x, k):
    """Space-to-depth equivalent of conv1_same(x, k, 2) for 7x7 kernels."""
    b, h, w, c = x.shape
    x = jnp.pad(x, [(0, 0), (3, 3), (3, 3), (0, 0)])
    hp, wp = h + 6, w + 6
    x = (x.reshape(b, hp // 2, 2, wp // 2, 2, c)
         .transpose(0, 1, 3, 2, 4, 5).reshape(b, hp // 2, wp // 2, 4 * c))
    return lax.conv_general_dilated(x, s2d_kernel(k), (1, 1), "VALID",
                                    dimension_numbers=_DN)


def cpu_equivalence_check():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 224, 224, 3)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(7, 7, 3, 64)), jnp.float32)
    a = np.asarray(conv1_same(x, k))
    b = np.asarray(conv1_s2d(x, k))
    assert a.shape == b.shape == (2, 112, 112, 64), (a.shape, b.shape)
    err = np.abs(a - b).max() / np.abs(a).max()
    print(f"s2d equivalence: shape {a.shape}, rel err {err:.2e}")
    assert err < 1e-6, "space-to-depth transform is NOT equivalent"
    # odd-size input (451px eval) must also hold: pad H to even first
    x451 = jnp.asarray(rng.normal(size=(1, 450, 450, 3)), jnp.float32)
    a = np.asarray(conv1_same(x451, k))
    b = np.asarray(conv1_s2d(x451, k))
    err = np.abs(a - b).max() / np.abs(a).max()
    print(f"s2d equivalence 450px: shape {a.shape}, rel err {err:.2e}")
    assert err < 1e-6
    print("CPU equivalence OK")


def device_experiments():
    from tpu_checks import timeit

    rng = np.random.default_rng(0)

    print("\n-- conv1 variants (bf16, device clock) --")
    for b, sz in [(512, 224), (96, 448)]:
        x = jnp.asarray(rng.normal(size=(b, sz, sz, 3)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(7, 7, 3, 64)) * 0.05, jnp.bfloat16)

        t_std = timeit(lambda x: jnp.sum(
            conv1_same(x, k).astype(jnp.float32)).reshape(1, 1), x,
            iters=30)
        t_s2d = timeit(lambda x: jnp.sum(
            conv1_s2d(x, k).astype(jnp.float32)).reshape(1, 1), x,
            iters=30)
        print(f"  B{b} {sz}px: conv2d_same={t_std*1e6:.0f}us "
              f"s2d={t_s2d*1e6:.0f}us speedup={t_std/t_s2d:.2f}x")

    print("\n-- int8 handoff: consumer-side vs producer-side quant --")
    # block3-scale chain: conv -> dequant -> relu -> (re)quant -> conv
    for b, hw, ch in [(256, 14, 1024), (256, 28, 512)]:
        xq = jnp.asarray(rng.integers(-127, 127, (b, hw, hw, ch)),
                         jnp.int8)
        w1 = jnp.asarray(rng.integers(-127, 127, (3, 3, ch, ch)), jnp.int8)
        w2 = jnp.asarray(rng.integers(-127, 127, (3, 3, ch, ch)), jnp.int8)
        s1 = jnp.float32(0.01)
        s2 = jnp.float32(0.02)

        def conv_i8(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=_DN,
                preferred_element_type=jnp.int32)

        def consumer_side(xq):
            # today's folded_forward: dequant to bf16, relu, handoff,
            # requant at the next conv's input
            y = (conv_i8(xq, w1).astype(jnp.float32) * s1)
            y = jax.nn.relu(y).astype(jnp.bfloat16)
            yq = jnp.clip(jnp.round(y.astype(jnp.float32) / s2),
                          -127, 127).astype(jnp.int8)
            z = conv_i8(yq, w2).astype(jnp.float32) * s2
            return jnp.sum(z).reshape(1, 1)

        def producer_side(xq):
            # quantize in the producer's epilogue: the handoff tensor is
            # int8; relu folds into the clip (scales positive)
            y = conv_i8(xq, w1).astype(jnp.float32) * (s1 / s2)
            yq = jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)
            z = conv_i8(yq, w2).astype(jnp.float32) * s2
            return jnp.sum(z).reshape(1, 1)

        t_c = timeit(consumer_side, xq, iters=30)
        t_p = timeit(producer_side, xq, iters=30)
        print(f"  B{b} {hw}x{hw}x{ch}: consumer={t_c*1e6:.0f}us "
              f"producer={t_p*1e6:.0f}us speedup={t_c/t_p:.2f}x")


def matmul_probes():
    """Does XLA's int8 MATMUL hit the MXU double-rate path (convs don't —
    round-2 microbench: 1.06-1.17x)?  If yes, 1x1 convs (~half the
    backbone FLOPs) reformulated as dot_general could unlock it."""
    from tpu_checks import timeit

    rng = np.random.default_rng(0)
    print("\n-- int8 vs bf16 matmul (device clock) --")
    for m, k, n in [(256 * 49, 1024, 256), (256 * 196, 256, 256),
                    (8192, 2048, 2048)]:
        a8 = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
        b8 = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)
        ab = a8.astype(jnp.bfloat16)
        bb = b8.astype(jnp.bfloat16)

        t8 = timeit(lambda x: jnp.sum(lax.dot_general(
            x, b8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32))
            .reshape(1, 1), a8, iters=50)
        tb = timeit(lambda x: jnp.sum(lax.dot_general(
            x, bb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)).reshape(1, 1), ab,
            iters=50)
        flops = 2 * m * k * n
        print(f"  ({m}x{k})@({k}x{n}): int8={t8*1e6:.0f}us "
              f"({flops/t8/1e12:.0f} TOP/s) bf16={tb*1e6:.0f}us "
              f"({flops/tb/1e12:.0f} TFLOP/s) speedup={tb/t8:.2f}x")

    print("\n-- 1x1 conv: lax.conv vs reshape+dot (int8) --")
    for b, hw, cin, cout in [(256, 14, 1024, 256), (256, 28, 512, 128),
                             (256, 7, 2048, 512)]:
        x8 = jnp.asarray(rng.integers(-127, 127, (b, hw, hw, cin)),
                         jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 127, (1, 1, cin, cout)),
                         jnp.int8)

        t_conv = timeit(lambda x: jnp.sum(lax.conv_general_dilated(
            x, w8, (1, 1), "SAME", dimension_numbers=_DN,
            preferred_element_type=jnp.int32).astype(jnp.float32))
            .reshape(1, 1), x8, iters=50)
        t_dot = timeit(lambda x: jnp.sum(lax.dot_general(
            x.reshape(b * hw * hw, cin), w8.reshape(cin, cout),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32))
            .reshape(1, 1), x8, iters=50)
        print(f"  B{b} {hw}x{hw} {cin}->{cout}: conv={t_conv*1e6:.0f}us "
              f"dot={t_dot*1e6:.0f}us speedup={t_conv/t_dot:.2f}x")


def e2e_dot_1x1():
    """End-to-end folded forward with 1x1 convs as dot_general (the flag
    added to models/inference.py) vs the lax.conv baseline — XLA's global
    layout assignment decides whether the matmul win survives the
    2D<->4D boundaries."""
    from tpu_checks import timeit

    from attentionalpoolingaction_tpu.models import inference as inf
    from attentionalpoolingaction_tpu.models.action_model import ActionModel

    rng = np.random.default_rng(0)
    for b, sz in [(256, 224), (96, 448)]:
        model = ActionModel(num_classes=393, backbone="resnet_v1_101",
                            pooling="attention", rank=1,
                            dtype=jnp.bfloat16)
        images = jnp.asarray(rng.normal(size=(b, sz, sz, 3)),
                             jnp.bfloat16)
        variables = model.init(jax.random.key(0), images[:1], train=False)
        folded = inf.fold_backbone(variables, "resnet_v1_101")
        head = variables["params"]["head"]
        act_scales = inf.calibrate_act_scales(
            folded, head, [np.asarray(images[:8], np.float32)],
            backbone="resnet_v1_101")
        q = inf.quantize_folded(folded)

        print(f"\n-- e2e dot_1x1 B{b} {sz}px (device clock) --")
        for tag, tree, scales in [("int8-static", q, act_scales),
                                  ("int8-dynamic", q, None),
                                  ("bf16-folded", folded, None)]:
            ts = {}
            for dot in (False, True):
                fn = lambda x, t=tree, s=scales, d=dot: jnp.sum(
                    inf.folded_forward(
                        t, head, x, act_scales=s, dtype=jnp.bfloat16,
                        dot_1x1=d)["logits"].astype(jnp.float32)
                ).reshape(1, 1)
                ts[dot] = timeit(fn, images, iters=10)
            print(f"  {tag:13s} conv={ts[False]*1e3:.2f}ms "
                  f"({b/ts[False]:.0f} img/s)  dot={ts[True]*1e3:.2f}ms "
                  f"({b/ts[True]:.0f} img/s)  "
                  f"speedup={ts[False]/ts[True]:.2f}x")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu_check_only", action="store_true")
    ap.add_argument("--only_e2e", action="store_true")
    args = ap.parse_args()
    print("backend:", jax.default_backend(), jax.devices())
    if args.only_e2e:
        e2e_dot_1x1()
        return
    cpu_equivalence_check()
    if not args.cpu_check_only:
        device_experiments()
        matmul_probes()
        e2e_dot_1x1()


if __name__ == "__main__":
    main()
