"""Batch inference CLI: checkpoint + image files -> top-k class
predictions as JSON lines (the serving-style counterpart of eval_cli's
dataset protocol).

Usage:
    python -m attentionalpoolingaction_tpu.predict_cli \
        --config mpii_rank1_224 --workdir /tmp/run1 \
        --images a.jpg b.jpg [--topk 5] [--batch_size 32]
"""

from __future__ import annotations

import json

import numpy as np
from absl import app, flags

from attentionalpoolingaction_tpu import checkpoint as ckpt_lib
from attentionalpoolingaction_tpu import config as config_lib
from attentionalpoolingaction_tpu import evaluate as eval_lib
from attentionalpoolingaction_tpu.train import build_model

FLAGS = flags.FLAGS
flags.DEFINE_string("config", "mpii_rank1_224", "preset name")
flags.DEFINE_string("workdir", None, "run dir containing checkpoints/")
flags.DEFINE_multi_string("images", [], "input image paths")
flags.DEFINE_integer("topk", 5, "top-k classes to report")
flags.DEFINE_integer("batch_size", 32, "inference batch size")
flags.DEFINE_integer("step", None, "checkpoint step (default latest)")
flags.DEFINE_bool("int8", False,
                  "BN-folded post-training-int8 serving path "
                  "(models/inference.py)")
flags.DEFINE_multi_string("set", [], "config overrides field=value")
flags.DEFINE_string("jax_platform", None, "force a JAX backend")
flags.mark_flag_as_required("workdir")


def main(argv):
    del argv
    if FLAGS.jax_platform:
        import jax

        jax.config.update("jax_platforms", FLAGS.jax_platform)
    overrides = config_lib.parse_overrides(FLAGS.set)
    overrides["workdir"] = FLAGS.workdir
    cfg = config_lib.get_config(FLAGS.config, **overrides)

    mgr = ckpt_lib.make_manager(cfg.workdir + "/checkpoints")
    restored = ckpt_lib.restore_for_eval(mgr, step=FLAGS.step)
    if restored is None:
        raise SystemExit(f"no checkpoint under {cfg.workdir}/checkpoints")
    if FLAGS.int8:
        import jax
        import numpy as _np

        from attentionalpoolingaction_tpu.models import inference as inf

        fwd = inf.make_int8_forward(
            {"params": restored.params,
             "batch_stats": restored.batch_stats},
            backbone=cfg.backbone,
            pooling="avg" if cfg.pooling == "avg" else "attention",
            calibration_batches=[_np.random.default_rng(0).normal(
                0, 64.0, (8, cfg.image_size, cfg.image_size, 3))])

        def step_fn(params, batch_stats, images):
            del params, batch_stats
            return fwd(jax.numpy.asarray(images))["logits"]
    else:
        model = build_model(cfg)
        step_fn = eval_lib.make_eval_step(model)

    from attentionalpoolingaction_tpu.data import preprocessing_np as ppnp

    paths = list(FLAGS.images)
    for lo in range(0, len(paths), FLAGS.batch_size):
        chunk = paths[lo:lo + FLAGS.batch_size]
        imgs = []
        for p in chunk:
            with open(p, "rb") as f:
                img, _ = ppnp.preprocess_image_np(
                    f.read(), out_size=cfg.image_size, is_training=False,
                    resize_min=cfg.resize_min_resolved)
            imgs.append(img)
        logits = np.asarray(step_fn(
            restored.params, restored.batch_stats,
            np.stack(imgs)))
        if cfg.dataset == "hico":
            probs = 1.0 / (1.0 + np.exp(-logits))      # multi-label
        else:
            e = np.exp(logits - logits.max(-1, keepdims=True))
            probs = e / e.sum(-1, keepdims=True)
        for path, p in zip(chunk, probs):
            top = np.argsort(-p)[:FLAGS.topk]
            print(json.dumps({
                "image": path,
                "topk": [{"class": int(c), "prob": float(p[c])}
                         for c in top],
            }), flush=True)


if __name__ == "__main__":
    app.run(main)
