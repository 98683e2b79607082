"""Decompose the inference forwards on the real chip: where does the
time go in the bf16 B512 fwd (the north-star metric) and the int8 B256
serving fwd?  Prints per-hlo_category device time and the top ops.

Methodology matches scripts/tpu_checks.py::timeit: host clocks lie
through the axon tunnel, so everything here is the profiler's device
clock.  Each variant runs a few dispatches under a jax.profiler trace;
the xplane "XLA Ops" line carries per-op durations and an hlo_category
stat, which is the same decomposition the round-2 train roofline used
(ARCHITECTURE.md "Train-step roofline").

Run manually, ONE JAX process at a time (see .claude/skills/verify):
    python scripts/tpu_fwd_profile.py [--top 15]
"""

import argparse
import collections
import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from attentionalpoolingaction_tpu.models import inference as inf
from attentionalpoolingaction_tpu.models.action_model import ActionModel


def profile_op_times(fn, *args, dispatches=3):
    """Run ``fn(*args)`` under a trace; return (op_times, cat_times) in
    seconds per dispatch: op_times[name], cat_times[hlo_category]."""
    out = fn(*args)
    float(np.asarray(out).ravel()[0])          # compile + D2H sync
    tmp = tempfile.mkdtemp(prefix="fwd_profile_")
    jax.profiler.start_trace(tmp)
    for _ in range(dispatches):
        out = fn(*args)
    float(np.asarray(out).ravel()[0])
    jax.profiler.stop_trace()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    pb = sorted(glob.glob(f"{tmp}/plugins/profile/*/*.xplane.pb"))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(pb, "rb").read())
    op_times = collections.Counter()
    cat_times = collections.Counter()
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        smeta = plane.stat_metadata
        emeta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = emeta[ev.metadata_id]
                cat = ""
                for st in md.stats:
                    if smeta[st.metadata_id].name == "hlo_category":
                        cat = (st.str_value
                               or smeta[st.ref_value].name)
                secs = ev.duration_ps / 1e12 / dispatches
                op_times[md.name] += secs
                cat_times[cat or "uncategorized"] += secs
    shutil.rmtree(tmp, ignore_errors=True)
    return op_times, cat_times


def report(tag, fn, images, top, batch):
    op_times, cat_times = profile_op_times(fn, images)
    total = sum(cat_times.values())
    print(f"\n=== {tag}: device {total*1e3:.2f} ms/dispatch "
          f"({batch/total:.0f} img/s) ===")
    print("-- by hlo_category --")
    for cat, t in cat_times.most_common():
        print(f"  {cat:28s} {t*1e3:8.3f} ms  {t/total*100:5.1f}%")
    print(f"-- top {top} ops --")
    for name, t in op_times.most_common(top):
        print(f"  {t*1e3:8.3f} ms  {t/total*100:5.1f}%  {name[:90]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--batch_bf16", type=int, default=512)
    ap.add_argument("--batch_int8", type=int, default=256)
    args = ap.parse_args()
    print("backend:", jax.default_backend(), jax.devices())

    model = ActionModel(num_classes=393, backbone="resnet_v1_101",
                        pooling="attention", rank=1, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    sz = args.image_size
    images = jnp.asarray(
        rng.normal(size=(args.batch_bf16, sz, sz, 3)), jnp.bfloat16)
    variables = model.init(jax.random.key(0), images[:1], train=False)

    @jax.jit
    def bf16_fwd(images):
        return model.apply(variables, images)["logits"]

    report(f"bf16 fwd B{args.batch_bf16} {sz}px", bf16_fwd, images,
           args.top, args.batch_bf16)

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

    imgs8 = images[:args.batch_int8]
    report(f"int8 fwd B{args.batch_int8} {sz}px (static scales)",
           int8_fwd, imgs8, args.top, args.batch_int8)

    @jax.jit
    def int8_dyn_fwd(images):
        return inf.folded_forward(q, head, images, act_scales=None,
                                  dtype=jnp.bfloat16)["logits"]

    report(f"int8 fwd B{args.batch_int8} {sz}px (dynamic scales)",
           int8_dyn_fwd, imgs8, args.top, args.batch_int8)


if __name__ == "__main__":
    main()
