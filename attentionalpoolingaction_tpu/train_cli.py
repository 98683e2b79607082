"""Training CLI — the reference's ``python train.py --flags`` surface
(SURVEY.md section 1 L7) as absl flags over named config presets.

Usage:
    python -m attentionalpoolingaction_tpu.train_cli \
        --config mpii_rank1_224 \
        --train_pattern=/data/mpii/train-*.tfrecord \
        --workdir=/tmp/run1 [--set batch_size=64 --set learning_rate=0.01]
"""

from __future__ import annotations

from absl import app, flags, logging

from attentionalpoolingaction_tpu import checkpoint as ckpt_lib
from attentionalpoolingaction_tpu import config as config_lib
from attentionalpoolingaction_tpu import train as train_lib
from attentionalpoolingaction_tpu.utils import metrics_writer

FLAGS = flags.FLAGS
flags.DEFINE_string("config", "mpii_rank1_224",
                    f"preset name, one of {sorted(config_lib.PRESETS)}")
flags.DEFINE_string("train_pattern", None, "train TFRecord glob")
flags.DEFINE_string("eval_pattern", None, "eval TFRecord glob")
flags.DEFINE_string("workdir", None, "checkpoint/metrics dir")
flags.DEFINE_string("init_checkpoint", None,
                    "fine-tune init: TF-slim .ckpt path (e.g. ImageNet "
                    "resnet_v1_101.ckpt) or an Orbax checkpoint dir from "
                    "a previous run; new-head scopes stay fresh")
flags.DEFINE_integer("num_steps", None, "override number of steps")
flags.DEFINE_integer("eval_every", 0,
                     "run eval on --eval_pattern every N steps (0 = off; "
                     "the reference-style alternative is a separate "
                     "eval_cli --follow job)")
flags.DEFINE_bool("keep_best", True,
                  "with --eval_every: keep the argmax-metric checkpoint "
                  "in <workdir>/checkpoints_best so the run's peak "
                  "survives max_to_keep pruning (restore it with "
                  "--step best on eval/serve/predict/export CLIs)")
flags.DEFINE_multi_string(
    "set", [], "config overrides as field=value (parsed as python literal "
    "when possible), e.g. --set batch_size=64")
flags.DEFINE_string("jax_platform", None,
                    "force a JAX backend (e.g. cpu); default = env")
flags.DEFINE_bool("multiprocess", False,
                  "initialize the JAX multi-host runtime "
                  "(jax.distributed.initialize)")
flags.DEFINE_integer("attn_summary_every", 0,
                     "write attention-map overlay images to TensorBoard "
                     "every N steps (0 = off; needs an attention head)")
flags.DEFINE_integer("trace_at_step", 0,
                     "capture a device profile starting at this step "
                     "(0 = off); written to <workdir>/trace for "
                     "TensorBoard's profile tab / Perfetto")
flags.DEFINE_integer("trace_steps", 3, "steps per profile capture")


def main(argv):
    del argv
    if FLAGS.jax_platform:
        import jax

        jax.config.update("jax_platforms", FLAGS.jax_platform)
    if FLAGS.multiprocess:
        from attentionalpoolingaction_tpu.parallel import multihost

        multihost.setup()
    overrides = config_lib.parse_overrides(FLAGS.set)
    for key in ("train_pattern", "eval_pattern", "workdir",
                "init_checkpoint"):
        val = getattr(FLAGS, key)
        if val is not None:
            overrides[key] = val
    cfg = config_lib.get_config(FLAGS.config, **overrides)
    logging.info("config: %s", cfg)

    mgr = ckpt_lib.make_manager(cfg.workdir + "/checkpoints",
                                max_to_keep=cfg.max_checkpoints)
    writer = metrics_writer.make_writer(cfg.workdir)
    hooks = [metrics_writer.make_train_hook(writer, cfg.log_every)]
    if FLAGS.eval_every and cfg.eval_pattern:
        from attentionalpoolingaction_tpu import evaluate as eval_lib

        # one Evaluator for the whole run: the eval step compiles once and
        # is reused by every in-training evaluation
        evaluator = eval_lib.Evaluator(cfg)
        best_keeper = (ckpt_lib.BestKeeper(cfg.workdir)
                       if FLAGS.keep_best else None)

        def eval_hook(step, state, metrics):
            del metrics
            if step % FLAGS.eval_every == 0:
                results = evaluator(state)
                metrics_writer.write_eval(writer, step, results)
                logging.info("eval@%d: %s", step, results)
                if best_keeper is not None:
                    best_keeper.update(step, results, state)

        hooks.append(eval_hook)
    else:
        best_keeper = None
    if FLAGS.attn_summary_every:
        from attentionalpoolingaction_tpu.utils import visualize

        hooks.append(visualize.make_attention_summary_hook(
            cfg, writer, FLAGS.attn_summary_every))
    if FLAGS.trace_at_step:
        from attentionalpoolingaction_tpu.utils import profiling

        hooks.append(profiling.make_trace_hook(
            cfg.workdir + "/trace", FLAGS.trace_at_step,
            FLAGS.trace_steps,
            last_step=FLAGS.num_steps or cfg.num_steps))
    state, _ = train_lib.train(
        cfg, num_steps=FLAGS.num_steps, checkpoint_manager=mgr, hooks=hooks)
    mgr.wait_until_finished()
    if best_keeper is not None:
        best_keeper.wait_until_finished()
    writer.flush()
    logging.info("done at step %d", int(state.step))


if __name__ == "__main__":
    app.run(main)
