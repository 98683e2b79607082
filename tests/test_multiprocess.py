"""Real 2-process distributed execution on CPU (VERDICT r1 missing #5).

Spawns two python processes that form a jax.distributed cluster over a
local coordinator and exercise, on a GLOBAL 2-device mesh:
  * multihost.setup (jax.distributed.initialize wiring),
  * per-host Grain input sharding (disjoint example streams),
  * global-batch assembly from process-local data
    (pipeline.prefetch_to_device -> make_array_from_process_local_data),
  * a jit'd psum across processes,
  * per-process grain iterator state files (no last-writer-wins).

The reference is single-machine (SURVEY.md section 2.4); this validates
the framework's multi-host recipe without TPU pods.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import sys

proc_id = int(sys.argv[1])
port = sys.argv[2]
tmp = sys.argv[3]

import jax

jax.config.update("jax_platforms", "cpu")

from attentionalpoolingaction_tpu.parallel import multihost

multihost.setup(coordinator_address=f"127.0.0.1:{port}",
                num_processes=2, process_id=proc_id)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.devices()
assert jax.local_device_count() == 1

import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from attentionalpoolingaction_tpu.data import grain_pipeline
from attentionalpoolingaction_tpu.data import pipeline
from attentionalpoolingaction_tpu.data.datasets import get_dataset
from attentionalpoolingaction_tpu.parallel import mesh as mesh_lib

multihost.assert_same_across_hosts(7, "smoke")

# --- cross-host stop agreement (preemption sync, ADVICE r2) ---
r = multihost.FlagAllReduce()
h = r.dispatch(proc_id == 0)       # only host 0 raises the flag
assert r.read(h) is True           # ...but BOTH hosts observe it
h = r.dispatch(False)
assert r.read(h) is False
assert multihost.allreduce_flag(proc_id == 1) is True
assert multihost.allreduce_flag(False) is False

# --- checkpoint-step agreement (eval_cli --follow polling skew): hosts
# can see different "latest" steps; host 0's view must win everywhere ---
assert multihost.broadcast_step(100 + proc_id) == 100
assert multihost.broadcast_step(None if proc_id == 0 else 7) is None

# --- global mesh over both processes' devices ---
mesh = mesh_lib.make_mesh((2,), ("data",))

# --- per-host grain sharding: disjoint streams over the same records ---
spec = get_dataset("mpii")
ds = grain_pipeline.make_train_dataset(
    tmp + "/train.tfrecord", spec, batch_size=2, image_size=32,
    resize_min=36, resize_max=40, seed=0,
    shard_index=jax.process_index(), shard_count=jax.process_count())
it = iter(ds)
local = next(it)
# labels 0..7 were written one per example; each host must see a disjoint
# half (slice(process_index, None, 2) over the 8-example file)
my_labels = set(local["label"].tolist())
my_labels |= set(next(it)["label"].tolist())
expected = set(range(jax.process_index(), 8, 2))
assert my_labels <= expected, (my_labels, expected)

# --- global batch assembly + psum across processes ---
def gen():
    while True:
        yield {"x": np.full((2, 4), float(jax.process_index() + 1),
                            np.float32)}

dev_iter = pipeline.prefetch_to_device(
    gen(), sharding=mesh_lib.batch_sharding(mesh))
batch = next(dev_iter)
assert batch["x"].shape == (4, 4), batch["x"].shape  # global batch
import jax.numpy as jnp

@jax.jit
def total(x):
    return jnp.sum(x)

# process 0 contributes 2*4*1, process 1 contributes 2*4*2 -> 24
got = float(total(batch["x"]))
assert got == 24.0, got

# --- per-process grain state files ---
import json
import pathlib


class Mgr:  # minimal manager shim: directory + steps
    directory = pathlib.Path(tmp) / "ck"

    @staticmethod
    def all_steps():
        return [1]


Mgr.directory.mkdir(exist_ok=True)
from attentionalpoolingaction_tpu import train as train_lib

p = train_lib._grain_state_path(Mgr, 1, jax.process_index())
p.write_text(json.dumps({"who": jax.process_index()}))
multihost.assert_same_across_hosts(1, "barrier")  # both files written
states = sorted(Mgr.directory.glob("grain_iter_1_p*.json"))
assert len(states) == 2, states
vals = sorted(json.loads(s.read_text())["who"] for s in states)
assert vals == [0, 1], vals

# --- stateful-iterator consumption path: mesh_lib.shard_batches must
# assemble BOTH hosts' (distinct) data into the global batch ---
sharded_iter = mesh_lib.shard_batches(gen(), mesh)
sb = next(sharded_iter)["x"]
assert sb.shape == (4, 4), sb.shape
assert float(total(sb)) == 24.0  # 8*1 (host0) + 8*2 (host1)

# --- eval mesh stays host-local on multi-process (fetching sharded
# logits to numpy requires every shard addressable) ---
from attentionalpoolingaction_tpu import evaluate as eval_lib
from attentionalpoolingaction_tpu.config import TrainConfig

cfg = TrainConfig(dataset="mpii", backbone="resnet_v1_50",
                  pooling="attention", image_size=32, batch_size=4,
                  bf16_backbone=False, learning_rate=1e-3,
                  grad_clip_norm=10.0, lr_schedule="constant",
                  mesh_shape=(2,), eval_batch_size=2)
m = eval_lib.mesh_from_config(cfg)
# 1 local device -> no useful local mesh: must be None, NOT a mesh over
# the 2-process global devices (which would crash the numpy fetch)
assert m is None, m

# --- multi-host SHARDED eval: each host reads half the split, results
# are gathered, metrics must equal the single-process run bit-for-bit ---
ecfg = TrainConfig(dataset="mpii", backbone="resnet_v1_50",
                  pooling="attention", image_size=32, resize_min=36,
                  bf16_backbone=False, learning_rate=1e-3,
                  grad_clip_norm=10.0, lr_schedule="constant",
                  eval_batch_size=2, seed=0,
                  eval_pattern=tmp + "/train.tfrecord")
# this host's shard really is half the split
shard_it = eval_lib.make_eval_input(ecfg, spec, shard_by_process=True)
n_local = sum(int(b["mask"].sum()) for b in shard_it)
assert n_local == 4, n_local
estate, _, _, _ = train_lib.create_state(ecfg)
res = eval_lib.evaluate(ecfg, estate)
assert res["num_examples"] == 8, res     # gathered across both hosts
print(f"EVAL mAP={res['mAP']!r} acc={res['accuracy']!r}")

# --- UNEVEN shards (5 examples over 2 hosts: 3 vs 2) exercise the
# padded gather; metrics must still match single-process bit-for-bit ---
import dataclasses
ecfg5 = dataclasses.replace(ecfg, eval_pattern=tmp + "/val5.tfrecord")
res5 = eval_lib.evaluate(ecfg5, estate)
assert res5["num_examples"] == 5, res5
print(f"EVAL5 mAP={res5['mAP']!r}")

# --- grain pipeline sharded eval (slice-by-process) gathers too ---
ecfgg = dataclasses.replace(ecfg, input_pipeline="grain")
resg = eval_lib.evaluate(ecfgg, estate)
assert resg["num_examples"] == 8, resg
print(f"EVALG mAP={resg['mAP']!r}")

print(f"WORKER{proc_id} OK")
"""


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    # records with deterministic labels 0..7 (one per example)
    from attentionalpoolingaction_tpu.data import records
    from attentionalpoolingaction_tpu.data.datasets import get_dataset

    spec = get_dataset("mpii")
    import numpy as np
    import tensorflow as tf

    rng = np.random.default_rng(0)
    examples = []
    for i in range(8):
        img = rng.integers(0, 255, (40, 40, 3), np.uint8)
        examples.append(records.make_example(
            tf.io.encode_jpeg(img).numpy(), height=40, width=40, label=i,
            keypoints=np.zeros((16, 2), np.float32),
            visibility=np.zeros((16,), np.float32)))
    records.write_tfrecord(str(tmp_path / "train.tfrecord"), examples)
    records.write_tfrecord(str(tmp_path / "val5.tfrecord"), examples[:5])

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    # each worker gets exactly ONE local CPU device (2 global)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(__file__)))
        for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER{i} OK" in out, out

    # sharded 2-process eval must equal the single-process eval bit-for-bit
    # (VERDICT r2 next #4) — compute the reference here (process_count=1)
    import re

    from attentionalpoolingaction_tpu import evaluate as eval_lib
    from attentionalpoolingaction_tpu import train as train_lib
    from attentionalpoolingaction_tpu.config import TrainConfig

    ecfg = TrainConfig(dataset="mpii", backbone="resnet_v1_50",
                       pooling="attention", image_size=32, resize_min=36,
                       bf16_backbone=False, learning_rate=1e-3,
                       grad_clip_norm=10.0, lr_schedule="constant",
                       eval_batch_size=2, seed=0,
                       eval_pattern=str(tmp_path / "train.tfrecord"))
    estate, _, _, _ = train_lib.create_state(ecfg)
    expected = eval_lib.evaluate(ecfg, estate)
    import dataclasses

    expected5 = eval_lib.evaluate(
        dataclasses.replace(ecfg,
                            eval_pattern=str(tmp_path / "val5.tfrecord")),
        estate)
    expectedg = eval_lib.evaluate(
        dataclasses.replace(ecfg, input_pipeline="grain"), estate)
    for out in outs:
        m = re.search(r"EVAL mAP=([\d.e+-]+) acc=([\d.e+-]+)", out)
        assert m, out
        assert abs(float(m.group(1)) - expected["mAP"]) < 1e-12, (
            m.group(1), expected["mAP"])
        assert abs(float(m.group(2)) - expected["accuracy"]) < 1e-9
        # uneven 3/2 shards (padded gather) match single-process exactly
        m5 = re.search(r"EVAL5 mAP=([\d.e+-]+)", out)
        assert m5, out
        assert abs(float(m5.group(1)) - expected5["mAP"]) < 1e-12
        # grain sharded eval matches the single-process grain eval
        # bit-for-bit (slice-by-process input path + gather)
        mg = re.search(r"EVALG mAP=([\d.e+-]+)", out)
        assert mg, out
        assert abs(float(mg.group(1)) - expectedg["mAP"]) < 1e-12, (
            mg.group(1), expectedg["mAP"])
