"""Attention-map visualization CLI (the reference's demo/notebook layer,
SURVEY.md sections 1 L8 and 3.4): restore a checkpoint, run images, write
heatmap-overlay PNGs (top-down per-class attention + bottom-up saliency).

Usage:
    python -m attentionalpoolingaction_tpu.visualize_cli \
        --config mpii_rank1_224 --workdir /tmp/run1 \
        --images img1.jpg img2.jpg --out_dir /tmp/viz [--class_idx 42]
"""

from __future__ import annotations

import os

import numpy as np
from absl import app, flags, logging

from attentionalpoolingaction_tpu import checkpoint as ckpt_lib
from attentionalpoolingaction_tpu import config as config_lib
from attentionalpoolingaction_tpu.train import build_model
from attentionalpoolingaction_tpu.utils import visualize as viz

FLAGS = flags.FLAGS
flags.DEFINE_string("config", "mpii_rank1_224", "preset name")
flags.DEFINE_string("workdir", None, "run dir containing checkpoints/")
flags.DEFINE_multi_string("images", [], "input image paths (jpeg/png)")
flags.DEFINE_string("out_dir", "/tmp/attnpool_viz", "output directory")
flags.DEFINE_integer("class_idx", None,
                     "class to visualize (default: predicted argmax)")
flags.DEFINE_string("step", None, "checkpoint step: an int, or 'best' for the keep-best slot (default latest)")
flags.DEFINE_bool("clip", False,
                  "treat --images as the ORDERED frames of one video: "
                  "run the clip-level spatiotemporal forward and write "
                  "per-frame overlays plus the temporal attention "
                  "distribution (which frames drove the prediction)")
flags.DEFINE_multi_string("set", [], "config overrides field=value")
flags.DEFINE_string("jax_platform", None, "force a JAX backend")
flags.mark_flag_as_required("workdir")


def load_and_preprocess(path, image_size):
    import cv2

    from attentionalpoolingaction_tpu.data import preprocessing_np as ppnp

    with open(path, "rb") as f:
        img, _ = ppnp.preprocess_image_np(
            f.read(), out_size=image_size, is_training=False,
            resize_min=round(image_size * 256 / 224))
    return img


def main(argv):
    del argv
    if FLAGS.jax_platform:
        import jax

        jax.config.update("jax_platforms", FLAGS.jax_platform)
    overrides = config_lib.parse_overrides(FLAGS.set)
    overrides["workdir"] = FLAGS.workdir
    cfg = config_lib.get_config(FLAGS.config, **overrides)

    mgr, step = ckpt_lib.manager_for_step(cfg.workdir, FLAGS.step)
    restored = ckpt_lib.restore_for_eval(mgr, step=step)
    if restored is None:
        raise SystemExit(f"no checkpoint under {cfg.workdir}/checkpoints")

    model = build_model(cfg)
    images = np.stack([
        load_and_preprocess(p, cfg.image_size) for p in FLAGS.images])
    variables = {"params": restored.params,
                 "batch_stats": restored.batch_stats}

    import cv2

    os.makedirs(FLAGS.out_dir, exist_ok=True)
    if FLAGS.clip:
        out = viz.clip_attention_overlays(model, variables, images,
                                          class_idx=FLAGS.class_idx)
        for t, src_path in enumerate(FLAGS.images):
            stem = os.path.splitext(os.path.basename(src_path))[0]
            for kind in ("top_down", "saliency"):
                dst = os.path.join(FLAGS.out_dir,
                                   f"{stem}_t{t:03d}_{kind}.png")
                cv2.imwrite(dst, cv2.cvtColor(out[kind][t],
                                              cv2.COLOR_RGB2BGR))
        ta = ", ".join(f"t{t}={v:.3f}"
                       for t, v in enumerate(out["temporal_attention"]))
        logging.info("video: predicted class %d", out["class_idx"])
        print(f"predicted class {out['class_idx']}; "
              f"temporal attention: {ta}")
        print(f"wrote {2 * len(FLAGS.images)} overlays to {FLAGS.out_dir}")
        return

    out = viz.attention_overlays(model, variables, images,
                                 class_idx=FLAGS.class_idx)
    for i, src_path in enumerate(FLAGS.images):
        stem = os.path.splitext(os.path.basename(src_path))[0]
        for kind in ("top_down", "saliency"):
            dst = os.path.join(FLAGS.out_dir, f"{stem}_{kind}.png")
            cv2.imwrite(dst, cv2.cvtColor(out[kind][i], cv2.COLOR_RGB2BGR))
        logging.info("%s: predicted class %d, wrote overlays", src_path,
                     int(out["class_idx"][i]))
    print(f"wrote {2 * len(FLAGS.images)} overlays to {FLAGS.out_dir}")


if __name__ == "__main__":
    app.run(main)
