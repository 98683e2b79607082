"""Evaluation CLI — the reference's ``python eval.py --flags`` surface
(SURVEY.md sections 1 L6 and 3.2).

Usage:
    python -m attentionalpoolingaction_tpu.eval_cli \
        --config mpii_rank1_224 --eval_pattern=/data/mpii/val-*.tfrecord \
        --workdir=/tmp/run1 [--step 20000]
"""

from __future__ import annotations

import json

from absl import app, flags, logging

from attentionalpoolingaction_tpu import checkpoint as ckpt_lib
from attentionalpoolingaction_tpu import config as config_lib
from attentionalpoolingaction_tpu import evaluate as eval_lib

FLAGS = flags.FLAGS
flags.DEFINE_string("config", "mpii_rank1_224", "preset name")
flags.DEFINE_string("eval_pattern", None, "eval TFRecord glob")
flags.DEFINE_string("workdir", None, "run dir containing checkpoints/")
flags.DEFINE_integer("step", None, "checkpoint step (default: latest)")
flags.DEFINE_multi_string("set", [], "config overrides field=value")
flags.DEFINE_string("jax_platform", None,
                    "force a JAX backend (e.g. cpu); default = env")


def main(argv):
    del argv
    if FLAGS.jax_platform:
        import jax

        jax.config.update("jax_platforms", FLAGS.jax_platform)
    overrides = config_lib.parse_overrides(FLAGS.set)
    if FLAGS.eval_pattern:
        overrides["eval_pattern"] = FLAGS.eval_pattern
    if FLAGS.workdir:
        overrides["workdir"] = FLAGS.workdir
    cfg = config_lib.get_config(FLAGS.config, **overrides)

    mgr = ckpt_lib.make_manager(cfg.workdir + "/checkpoints")
    restored = ckpt_lib.restore_for_eval(mgr, step=FLAGS.step)
    if restored is None:
        raise SystemExit(
            f"no checkpoint found under {cfg.workdir}/checkpoints")
    results = eval_lib.evaluate(cfg, restored)
    logging.info("eval results: %s", results)
    print(json.dumps(results))


if __name__ == "__main__":
    app.run(main)
