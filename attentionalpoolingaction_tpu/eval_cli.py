"""Evaluation CLI — the reference's ``python eval.py --flags`` surface
(SURVEY.md sections 1 L6 and 3.2).

Usage:
    python -m attentionalpoolingaction_tpu.eval_cli \
        --config mpii_rank1_224 --eval_pattern=/data/mpii/val-*.tfrecord \
        --workdir=/tmp/run1 [--step 20000] [--follow --poll_secs 60]

``--follow`` re-evaluates each new checkpoint as it appears (the
reference's slim.evaluation loop watching the train job's save dir).
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
flags.DEFINE_string("step", None,
                    "checkpoint step: an int, or 'best' for the "
                    "keep-best slot (default: latest)")
flags.DEFINE_multi_string("set", [], "config overrides field=value")
flags.DEFINE_string("jax_platform", None,
                    "force a JAX backend (e.g. cpu); default = env")
flags.DEFINE_bool("multiprocess", False,
                  "initialize the JAX multi-host runtime; eval then "
                  "shards the split across processes (each host reads "
                  "1/process_count, results are gathered — identical "
                  "metrics on every host, 1/N the wall time)")
flags.DEFINE_bool("follow", False,
                  "keep polling for new checkpoints and eval each one")
flags.DEFINE_integer("poll_secs", 60, "poll interval for --follow")
flags.DEFINE_integer("max_evals", None,
                     "stop --follow after this many evaluations")
flags.DEFINE_string("out_json", None,
                    "also append results as JSON lines to this file")
flags.DEFINE_bool("per_class", False, "include per-class AP in results")
flags.DEFINE_bool("tb", True,
                  "write eval/* scalars as TensorBoard event files to the "
                  "workdir, so eval-over-time curves exist even when eval "
                  "runs standalone (--follow) with no train process")
flags.DEFINE_string("per_class_output", None,
                    "append {step, per_class_ap[, per_class_ap_ko]} JSON "
                    "lines to this file (HICO/MPII per-class analysis)")


def main(argv):
    del argv
    if FLAGS.jax_platform:
        import jax

        jax.config.update("jax_platforms", FLAGS.jax_platform)
    if FLAGS.multiprocess:
        from attentionalpoolingaction_tpu.parallel import multihost

        multihost.setup()
    overrides = config_lib.parse_overrides(FLAGS.set)
    if FLAGS.eval_pattern:
        overrides["eval_pattern"] = FLAGS.eval_pattern
    if FLAGS.workdir:
        overrides["workdir"] = FLAGS.workdir
    cfg = config_lib.get_config(FLAGS.config, **overrides)

    if FLAGS.follow and FLAGS.step is not None:
        raise app.UsageError(
            "--follow re-evaluates each NEW checkpoint; --step (incl. "
            "'best') is a one-shot selection — drop one of the two")
    mgr, step_flag = ckpt_lib.manager_for_step(cfg.workdir, FLAGS.step)
    # compiled once; --follow re-evals reuse it across checkpoints
    evaluator = eval_lib.Evaluator(cfg)

    from attentionalpoolingaction_tpu.parallel import multihost

    import jax

    # standalone-eval observability (VERDICT r3 next #7): event files from
    # eval_cli itself, so a --follow job leaves the same eval-over-time TB
    # curves a train-process eval hook would.  Host 0 only (identical
    # gathered results everywhere; N writers would duplicate the stream).
    from attentionalpoolingaction_tpu.utils import metrics_writer
    writer = (metrics_writer.make_writer(cfg.workdir)
              if FLAGS.tb and jax.process_index() == 0 else None)
    want_per_class = FLAGS.per_class or bool(FLAGS.per_class_output)

    def eval_step(step):
        restored = ckpt_lib.restore_for_eval(mgr, step=step)
        # Collective agreement: if ANY host failed to restore (e.g. the step
        # was pruned by max_to_keep between list and restore), every host
        # must skip — otherwise one process skips the eval gather while the
        # others block in it and the pod hangs.  Single-process: plain bool.
        if multihost.allreduce_flag(restored is None):
            return None
        results = evaluator(restored, return_per_class=want_per_class)
        results["step"] = int(restored.step)
        logging.info("eval results: %s", results)
        # multi-host: every process holds identical gathered results;
        # only host 0 emits them (a shared out_json would get N copies)
        if jax.process_index() == 0:
            if writer is not None:
                metrics_writer.write_eval(writer, results["step"], results)
                writer.flush()
            if FLAGS.per_class_output:
                pc = {"step": results["step"]}
                for k in ("per_class_ap", "per_class_ap_ko"):
                    if k in results:
                        pc[k] = results[k]
                with open(FLAGS.per_class_output, "a") as f:
                    f.write(json.dumps(pc) + "\n")
            if not FLAGS.per_class:
                # vectors were only computed for --per_class_output; keep
                # the printed/out_json line compact
                results = {k: v for k, v in results.items()
                           if not k.startswith("per_class_ap")}
            print(json.dumps(results), flush=True)
            if FLAGS.out_json:
                with open(FLAGS.out_json, "a") as f:
                    f.write(json.dumps(results) + "\n")
        return results

    if not FLAGS.follow:
        # Same race as the --follow loop: with --step unset, hosts can
        # observe different "latest" checkpoints (filesystem propagation
        # while training is still writing) and would silently pair
        # mixed-step logits in the eval gather.  Agree on host 0's view
        # before the collective restore.
        step = step_flag
        if step is None:
            step = multihost.broadcast_step(mgr.latest_step())
        if step is None or eval_step(step) is None:
            raise SystemExit(
                f"no checkpoint found under {mgr.directory}")
        return

    import time

    seen = set()
    n_evals = 0
    while FLAGS.max_evals is None or n_evals < FLAGS.max_evals:
        mgr.reload()
        # hosts poll the checkpoint dir independently and can observe
        # different "latest" steps — agree on host 0's view before the
        # collective eval (mixed steps would silently pair in the gather)
        latest = multihost.broadcast_step(mgr.latest_step())
        if latest is not None and latest not in seen:
            seen.add(latest)
            eval_step(latest)
            n_evals += 1
        else:
            time.sleep(FLAGS.poll_secs)


if __name__ == "__main__":
    app.run(main)
