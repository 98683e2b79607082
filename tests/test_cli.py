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


def read_until(p, marker, timeout=360):
    """Read subprocess stdout lines until ``marker`` appears.  A watchdog
    kills the process at ``timeout`` so a subprocess that wedges WITHOUT
    printing fails the test with the captured output instead of blocking
    readline forever (the in-loop deadline assert only ran when a new
    line arrived)."""
    import threading

    lines = []
    timer = threading.Timer(timeout, p.kill)
    timer.start()
    try:
        for line in p.stdout:
            lines.append(line)
            if marker in line:
                return lines
    finally:
        timer.cancel()
    raise AssertionError(
        f"marker {marker!r} not seen before EOF/timeout({timeout}s):\n"
        + "".join(lines)[-2000:])


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
    per_class_out = str(tmp_path / "per_class.jsonl")
    import glob
    events_before = set(glob.glob(workdir + "/events.out.tfevents.*"))
    r = run_cli("attentionalpoolingaction_tpu.eval_cli",
                "--config", "mpii_rank1_224",
                "--eval_pattern", train_p, "--workdir", workdir,
                "--out_json", out_json, "--per_class",
                "--per_class_output", per_class_out, *COMMON)
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    results = json.loads(line)
    assert results["step"] == 2
    assert "mAP" in results and len(results["per_class_ap"]) == 393
    with open(out_json) as f:
        assert json.loads(f.readline())["step"] == 2
    # standalone eval leaves TB eval curves in the workdir (VERDICT r3
    # next #7) — a new event file whose payload carries the eval/ tags
    new_events = set(glob.glob(
        workdir + "/events.out.tfevents.*")) - events_before
    assert new_events, "eval_cli wrote no TensorBoard event file"
    payload = b"".join(open(p, "rb").read() for p in sorted(new_events))
    assert b"eval/mAP" in payload
    # per-class dump file: JSON lines of {step, per_class_ap}
    pc = json.loads(open(per_class_out).readline())
    assert pc["step"] == 2 and len(pc["per_class_ap"]) == 393

    # predict_cli on the same checkpoint (thin shell over serving.Predictor)
    import cv2
    import numpy as np
    img_p = str(tmp_path / "img.jpg")
    cv2.imwrite(img_p, np.random.default_rng(0).integers(
        0, 255, (80, 80, 3), np.uint8))
    r = run_cli("attentionalpoolingaction_tpu.predict_cli",
                "--config", "mpii_rank1_224", "--workdir", workdir,
                "--images", img_p, "--topk", "3", "--batch_size", "2",
                *COMMON)
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    pred = json.loads(line)
    assert pred["image"] == img_p and len(pred["topk"]) == 3


@pytest.mark.slow
def test_serve_cli_sigterm_drains(tmp_path):
    """Serving-side preemption contract: SIGTERM -> drain log, HTTP loop
    exits, batcher stops, process exits 0 (serve_cli round 3)."""
    import http.client
    import signal
    import socket

    spec = get_dataset("mpii")
    train_p = str(tmp_path / "train.tfrecord")
    records.write_synthetic_dataset(train_p, spec, 8, image_size=80)
    workdir = str(tmp_path / "run")
    r = run_cli("attentionalpoolingaction_tpu.train_cli",
                "--config", "mpii_rank1_224",
                "--train_pattern", train_p, "--workdir", workdir,
                "--num_steps", "1", "--set", "checkpoint_every=1", *COMMON)
    assert r.returncode == 0, r.stderr[-2000:]

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    p = subprocess.Popen(
        [sys.executable, "-u", "-m",
         "attentionalpoolingaction_tpu.serve_cli",
         "--config", "mpii_rank1_224", "--workdir", workdir,
         "--port", str(port), "--buckets", "1,2",
         "--set", "backbone=resnet_v1_50", "--set", "image_size=64",
         "--set", "bf16_backbone=False", "--set", "resize_min=72"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env={**os.environ, "PYTHONPATH": REPO,
                       "JAX_PLATFORMS": "cpu"})
    try:
        lines = read_until(p, "serving mpii_rank1_224 on")

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["status"] == "ok"

        p.send_signal(signal.SIGTERM)
        rest = p.stdout.read()
        rc = p.wait(timeout=120)
        out = "".join(lines) + rest
        assert rc == 0, out[-2000:]
        assert "draining" in out, out[-2000:]
    finally:
        if p.poll() is None:
            p.kill()


@pytest.mark.slow
def test_export_cli_then_serve_exported(tmp_path):
    """Deployment path end-to-end: train -> export_cli (AOT artifact with
    built-in load-back parity gate) -> serve_cli --exported_dir serves it
    over HTTP without touching the checkpoint."""
    import http.client
    import socket

    spec = get_dataset("mpii")
    train_p = str(tmp_path / "train.tfrecord")
    records.write_synthetic_dataset(train_p, spec, 8, image_size=80)
    workdir = str(tmp_path / "run")
    r = run_cli("attentionalpoolingaction_tpu.train_cli",
                "--config", "mpii_rank1_224",
                "--train_pattern", train_p, "--workdir", workdir,
                "--num_steps", "1", "--set", "checkpoint_every=1", *COMMON)
    assert r.returncode == 0, r.stderr[-2000:]

    artifact = str(tmp_path / "artifact")
    r = run_cli("attentionalpoolingaction_tpu.export_cli",
                "--config", "mpii_rank1_224", "--workdir", workdir,
                "--out_dir", artifact, "--buckets", "1,2",
                "--set", "backbone=resnet_v1_50", "--set", "image_size=64",
                "--set", "bf16_backbone=False", "--set", "resize_min=72")
    assert r.returncode == 0, r.stderr[-2000:]
    # the gate probes EVERY exported dtype trace
    assert "EXPORT PARITY[uint8] max|dprob| = 0" in r.stdout, \
        r.stdout[-2000:]
    assert "EXPORT PARITY[float32] max|dprob| = 0" in r.stdout, \
        r.stdout[-2000:]

    # float32-only export: the parity gate must probe with floats (a
    # uint8 probe used to crash AFTER writing the artifact — r3 review)
    artifact_f32 = str(tmp_path / "artifact_f32")
    r = run_cli("attentionalpoolingaction_tpu.export_cli",
                "--config", "mpii_rank1_224", "--workdir", workdir,
                "--out_dir", artifact_f32, "--buckets", "1",
                "--input_dtypes", "float32",
                "--set", "backbone=resnet_v1_50", "--set", "image_size=64",
                "--set", "bf16_backbone=False", "--set", "resize_min=72")
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "EXPORT PARITY[float32] max|dprob| = 0" in r.stdout, \
        r.stdout[-2000:]

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    p = subprocess.Popen(
        [sys.executable, "-u", "-m",
         "attentionalpoolingaction_tpu.serve_cli",
         "--exported_dir", artifact, "--port", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env={**os.environ, "PYTHONPATH": REPO,
                       "JAX_PLATFORMS": "cpu"})
    try:
        read_until(p, f"serving {artifact} on")
        import cv2
        import numpy as np

        ok, buf = cv2.imencode(".jpg", np.random.default_rng(0).integers(
            0, 255, (80, 80, 3), np.uint8))
        assert ok
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST", "/predict", body=bytes(buf.tobytes()))
        res = json.loads(conn.getresponse().read())
        assert len(res["topk"]) == 5, res
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["buckets"] == [1, 2]   # from the artifact manifest
    finally:
        p.kill()
        p.wait(timeout=60)

    # predict_cli consumes the same artifact (offline batch prediction,
    # no checkpoint/model build) ...
    import cv2
    import numpy as np
    img_p = str(tmp_path / "img.jpg")
    cv2.imwrite(img_p, np.random.default_rng(0).integers(
        0, 255, (80, 80, 3), np.uint8))
    r = run_cli("attentionalpoolingaction_tpu.predict_cli",
                "--exported_dir", artifact, "--images", img_p,
                "--topk", "3")
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["image"] == img_p and len(res["topk"]) == 3

    # ... and rejects checkpoint-only flags combined with it
    r = run_cli("attentionalpoolingaction_tpu.predict_cli",
                "--exported_dir", artifact, "--images", img_p, "--ema")
    assert r.returncode != 0
    assert "--ema" in (r.stderr + r.stdout)

    # --video on a per-image artifact: clean nonzero exit with the
    # re-export hint, not a shape crash
    r = run_cli("attentionalpoolingaction_tpu.predict_cli",
                "--exported_dir", artifact, "--images", img_p, "--video")
    assert r.returncode != 0
    assert "clip" in (r.stderr + r.stdout)


@pytest.mark.slow
def test_sigterm_preempts_cleanly(tmp_path):
    """Pod preemption contract: SIGTERM mid-run -> the loop checkpoints
    the current step (checkpoint_every is far away), logs, exits 0."""
    import signal

    spec = get_dataset("mpii")
    train_p = str(tmp_path / "train.tfrecord")
    records.write_synthetic_dataset(train_p, spec, 8, image_size=80)
    workdir = str(tmp_path / "run")

    p = subprocess.Popen(
        [sys.executable, "-u", "-m", "attentionalpoolingaction_tpu.train_cli",
         "--config", "mpii_rank1_224", "--train_pattern", train_p,
         "--workdir", workdir, "--num_steps", "500",
         "--set", "checkpoint_every=1000", "--set", "log_every=1", *COMMON],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env={**os.environ, "PYTHONPATH": REPO,
                       "JAX_PLATFORMS": "cpu"})
    lines = read_until(p, "step 3 ")
    p.send_signal(signal.SIGTERM)
    rest = p.stdout.read()
    rc = p.wait(timeout=300)
    out = "".join(lines) + rest
    assert rc == 0, out[-2000:]
    assert "exiting cleanly" in out, out[-2000:]
    ckpt_dir = os.path.join(workdir, "checkpoints")
    steps = [int(n) for n in os.listdir(ckpt_dir) if n.isdigit()]
    assert steps and max(steps) >= 3, steps
