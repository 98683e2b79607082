"""Metrics/observability: CLU metric writers -> TensorBoard event files +
stdout (the reference's tf.summary scalar stream, SURVEY.md section 5
"Metrics/logging" row)."""

from __future__ import annotations


def make_writer(workdir: str, *, just_logging: bool = False):
    from clu import metric_writers

    return metric_writers.create_default_writer(
        workdir, just_logging=just_logging)


def make_train_hook(writer, log_every: int):
    """Train-loop hook: writes scalar metrics every ``log_every`` steps."""
    def hook(step, state, metrics):
        del state
        if step % log_every == 0:
            writer.write_scalars(
                step, {k: float(v) for k, v in metrics.items()})
    return hook


def write_eval(writer, step: int, results: dict):
    scalars = {f"eval/{k}": float(v) for k, v in results.items()
               if isinstance(v, (int, float))}
    writer.write_scalars(step, scalars)
