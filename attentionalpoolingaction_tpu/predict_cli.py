"""Batch inference CLI: checkpoint + image files -> top-k class
predictions as JSON lines (the serving-style counterpart of eval_cli's
dataset protocol).  A thin shell over serving.Predictor — the same
preprocessing, bucketing, softmax/sigmoid, and top-k as serve_cli's
HTTP endpoint (one implementation to maintain).

Usage:
    python -m attentionalpoolingaction_tpu.predict_cli \
        --config mpii_rank1_224 --workdir /tmp/run1 \
        --images a.jpg b.jpg [--topk 5] [--batch_size 32] [--int8]
    # or from an AOT artifact (export_cli) — no model code/checkpoint:
    python -m attentionalpoolingaction_tpu.predict_cli \
        --exported_dir /tmp/artifact --images a.jpg b.jpg
    # one VIDEO (ordered frames) -> one clip-pooled prediction:
    python -m attentionalpoolingaction_tpu.predict_cli \
        --config hmdb51_clip8 --workdir /tmp/run2 --video \
        --images f000.jpg f001.jpg f002.jpg
"""

from __future__ import annotations

import json

from absl import app, flags

from attentionalpoolingaction_tpu import config as config_lib
from attentionalpoolingaction_tpu import serving

FLAGS = flags.FLAGS
flags.DEFINE_string("config", "mpii_rank1_224", "preset name")
flags.DEFINE_string("workdir", None, "run dir containing checkpoints/")
flags.DEFINE_string(
    "exported_dir", None,
    "predict from an AOT artifact (export_cli) instead of a checkpoint; "
    "checkpoint-only flags (--int8/--ema/--step/--set) are an error "
    "with this (the artifact fixed them at export time)")
flags.DEFINE_multi_string("images", [], "input image paths")
flags.DEFINE_bool("video", False,
                  "treat --images as the ORDERED frames of ONE video — "
                  "or, when it is a single .mp4/.avi/.mov/.mkv/.webm "
                  "path, as the encoded video FILE itself: TSN-subsample "
                  "to the model's clip length and print a single "
                  "clip-pooled prediction (the offline counterpart of "
                  "serve_cli's /predict_video)")
flags.DEFINE_integer("topk", 5, "top-k classes to report")
flags.DEFINE_integer("batch_size", 32, "inference batch size")
flags.DEFINE_string("step", None, "checkpoint step: an int, or 'best' for the keep-best slot (default latest)")
flags.DEFINE_bool("int8", False,
                  "BN-folded post-training-int8 serving path "
                  "(models/inference.py)")
flags.DEFINE_bool("ema", False,
                  "use the EMA weights (requires ema_decay training)")
flags.DEFINE_bool("data_parallel", False,
                  "shard each batch across all local devices "
                  "(multi-chip hosts; batch rounds up to chip multiples)")
flags.DEFINE_multi_string("set", [], "config overrides field=value")
flags.DEFINE_string("jax_platform", None, "force a JAX backend")


def main(argv):
    del argv
    if FLAGS.jax_platform:
        import jax

        jax.config.update("jax_platforms", FLAGS.jax_platform)
    if FLAGS.exported_dir:
        from attentionalpoolingaction_tpu import export as export_lib

        export_lib.reject_checkpoint_flags(
            FLAGS, ("config", "workdir", "int8", "ema", "step", "set"))
        predictor = export_lib.load_exported(
            FLAGS.exported_dir, data_parallel=FLAGS.data_parallel)
    elif FLAGS.workdir:
        overrides = config_lib.parse_overrides(FLAGS.set)
        overrides["workdir"] = FLAGS.workdir
        cfg = config_lib.get_config(FLAGS.config, **overrides)
        predictor = serving.load_predictor(
            cfg, step=FLAGS.step, int8=FLAGS.int8,
            buckets=(FLAGS.batch_size,), use_ema=FLAGS.ema,
            data_parallel=FLAGS.data_parallel)
    else:
        raise app.UsageError("one of --workdir / --exported_dir required")
    paths = list(FLAGS.images)
    if FLAGS.video:
        blobs = []
        for p in paths:
            with open(p, "rb") as f:
                blobs.append(f.read())
        if len(paths) == 1 and paths[0].rsplit(".", 1)[-1].lower() in (
                "mp4", "avi", "mov", "mkv", "webm", "video"):
            # one VIDEO FILE: decode the TSN picks from the container
            # (serve_cli /predict_video's raw-upload counterpart)
            res = predictor.predict_video_bytes(blobs[0],
                                                topk=FLAGS.topk)
        else:
            res = predictor.predict_clip_bytes(blobs, topk=FLAGS.topk)
        if "error" in res:
            raise SystemExit(res["error"])
        print(json.dumps({"frames": paths, **res}), flush=True)
        return
    for lo in range(0, len(paths), FLAGS.batch_size):
        chunk = paths[lo:lo + FLAGS.batch_size]
        blobs = []
        for p in chunk:
            with open(p, "rb") as f:
                blobs.append(f.read())
        for path, res in zip(chunk, predictor.predict_bytes(
                blobs, topk=FLAGS.topk)):
            print(json.dumps({"image": path, **res}), flush=True)


if __name__ == "__main__":
    app.run(main)
