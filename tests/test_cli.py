"""CLI surfaces via subprocess: train_cli -> eval_cli (+ --follow,
--out_json) on CPU with synthetic records."""

import json
import os
import subprocess
import sys

import pytest

from attentionalpoolingaction_tpu.data import records
from attentionalpoolingaction_tpu.data.datasets import get_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMMON = ["--set", "backbone=resnet_v1_50", "--set", "image_size=64",
          "--set", "batch_size=4", "--set", "eval_batch_size=4",
          "--set", "bf16_backbone=False", "--set", "resize_min=72",
          "--set", "resize_max=90", "--set", "learning_rate=0.001",
          "--jax_platform=cpu"]


def run_cli(module, *args, timeout=420):
    return subprocess.run(
        [sys.executable, "-u", "-m", module, *args],
        capture_output=True, text=True, timeout=timeout, cwd=REPO,
        # JAX_PLATFORMS must be set via env: the axon plugin registration
        # can fail while the parent test process holds the device tunnel
        env={**os.environ, "PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu"})


@pytest.mark.slow
def test_train_then_eval_cli(tmp_path):
    spec = get_dataset("mpii")
    train_p = str(tmp_path / "train.tfrecord")
    records.write_synthetic_dataset(train_p, spec, 8, image_size=80)
    workdir = str(tmp_path / "run")

    r = run_cli("attentionalpoolingaction_tpu.train_cli",
                "--config", "mpii_rank1_224",
                "--train_pattern", train_p, "--workdir", workdir,
                "--num_steps", "2", "--set", "checkpoint_every=2", *COMMON)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.isdir(workdir + "/checkpoints")

    out_json = str(tmp_path / "results.jsonl")
    r = run_cli("attentionalpoolingaction_tpu.eval_cli",
                "--config", "mpii_rank1_224",
                "--eval_pattern", train_p, "--workdir", workdir,
                "--out_json", out_json, "--per_class", *COMMON)
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    results = json.loads(line)
    assert results["step"] == 2
    assert "mAP" in results and len(results["per_class_ap"]) == 393
    with open(out_json) as f:
        assert json.loads(f.readline())["step"] == 2
