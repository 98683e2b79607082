"""Multi-device sharding on the 8-virtual-CPU-device mesh: pjit train step
with data-parallel gradient psum, sharded eval, multi-crop eval
(SURVEY.md section 4 item 4)."""

import jax
import jax.numpy as jnp
import numpy as np

from attentionalpoolingaction_tpu import evaluate as eval_lib
from attentionalpoolingaction_tpu import train as train_lib
from attentionalpoolingaction_tpu.config import TrainConfig
from attentionalpoolingaction_tpu.data.datasets import get_dataset
from attentionalpoolingaction_tpu.parallel import mesh as mesh_lib


def cfg8(**kw):
    base = dict(
        dataset="mpii", backbone="resnet_v1_50", pooling="attention",
        rank=1, image_size=64, batch_size=16, bf16_backbone=False,
        learning_rate=1e-3, grad_clip_norm=10.0, lr_schedule="constant",
        mesh_shape=(8,))
    base.update(kw)
    return TrainConfig(**base)


def synth_batch(cfg, spec, rng, with_pose=False):
    b = cfg.batch_size
    if spec.multi_label:
        label = (rng.random((b, spec.num_classes)) > 0.9).astype(np.float32)
    else:
        label = rng.integers(0, spec.num_classes, b).astype(np.int32)
    batch = {
        "image": rng.normal(size=(b, cfg.image_size, cfg.image_size, 3)
                            ).astype(np.float32),
        "label": label,
        "transform": np.tile(
            np.array([1.0, 1.0, 0.0, 0.0, 0.0], np.float32), (b, 1)),
    }
    if with_pose:
        batch["keypoints"] = rng.uniform(
            0, cfg.image_size, (b, 16, 2)).astype(np.float32)
        batch["visibility"] = np.ones((b, 16), np.float32)
    return batch


def test_mesh_creation():
    mesh = mesh_lib.make_mesh((8,), ("data",))
    assert mesh.shape == {"data": 8}
    assert len(jax.devices()) == 8


def test_pjit_train_step_runs_and_shards(rng):
    cfg = cfg8()
    spec = get_dataset(cfg.dataset)
    state, _, model, tx = train_lib.create_state(cfg)
    mesh = mesh_lib.make_mesh((8,), ("data",))
    step_fn = train_lib.make_train_step(model, spec, cfg, tx, mesh)
    batch = mesh_lib.shard_batch(synth_batch(cfg, spec, rng), mesh)
    # input batch is really sharded over 8 devices
    assert len(batch["image"].sharding.device_set) == 8
    state, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["loss/total"]))
    # params replicated after the step
    p0 = jax.tree.leaves(state.params)[0]
    assert p0.sharding.is_fully_replicated


def test_pjit_matches_single_device(rng):
    """Gradient psum over the mesh must reproduce single-device training."""
    cfg = cfg8(batch_size=8)
    spec = get_dataset(cfg.dataset)
    state1, _, model, tx = train_lib.create_state(cfg)
    # deep-copy: the single-device step donates (and deletes) state1 buffers
    state2 = jax.tree.map(lambda x: jnp.array(x), state1)
    batch = synth_batch(cfg, spec, rng)

    single = train_lib.make_train_step(model, spec, cfg, tx, mesh=None)
    s1, m1 = single(state1, jax.tree.map(jnp.asarray, batch))

    mesh = mesh_lib.make_mesh((8,), ("data",))
    sharded = train_lib.make_train_step(model, spec, cfg, tx, mesh)
    s2, m2 = sharded(state2, mesh_lib.shard_batch(batch, mesh))

    np.testing.assert_allclose(
        float(m1["loss/total"]), float(m2["loss/total"]), rtol=1e-4)
    a = jax.tree.leaves(s1.params)
    b = jax.tree.leaves(s2.params)
    worst = max(float(jnp.abs(x - y).max()) for x, y in zip(a, b))
    assert worst < 1e-4


def test_pose_attention_sharded(rng):
    cfg = cfg8(pooling="pose_attention")
    spec = get_dataset(cfg.dataset)
    state, _, model, tx = train_lib.create_state(cfg)
    mesh = mesh_lib.make_mesh((8,), ("data",))
    step_fn = train_lib.make_train_step(model, spec, cfg, tx, mesh)
    batch = mesh_lib.shard_batch(
        synth_batch(cfg, spec, rng, with_pose=True), mesh)
    state, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["loss/pose"]))


def test_sharded_eval_step(rng):
    cfg = cfg8()
    state, _, model, _ = train_lib.create_state(cfg)
    mesh = mesh_lib.make_mesh((8,), ("data",))
    step = eval_lib.make_eval_step(model, mesh)
    images = jnp.asarray(rng.normal(size=(16, 64, 64, 3)), jnp.float32)
    images = jax.device_put(images, mesh_lib.batch_sharding(mesh))
    logits = step(state.params, state.batch_stats, images)
    assert logits.shape == (16, 393)


def test_tensor_parallel_head(rng):
    """2D mesh (data x model): pooling-head class dim shards over 'model';
    results must match the pure-DP run."""
    from jax.sharding import PartitionSpec as P

    # HICO: C=600 divides the model axis (MPII's 393 would stay replicated)
    cfg = cfg8(dataset="hico", batch_size=8, mesh_shape=(4, 2),
               mesh_axes=("data", "model"))
    spec = get_dataset(cfg.dataset)
    state1, _, model, tx = train_lib.create_state(cfg)
    state2 = jax.tree.map(lambda x: jnp.array(x), state1)
    batch = synth_batch(cfg, spec, rng)

    mesh2d = mesh_lib.make_mesh((4, 2), ("data", "model"))
    tp_step = train_lib.make_train_step(model, spec, cfg, tx, mesh2d)
    s_tp, m_tp = tp_step(state1, mesh_lib.shard_batch(batch, mesh2d))
    # head weights really sharded over the model axis
    aw = s_tp.params["head"]["attn_w"]
    assert aw.sharding.spec == P(None, "model", None)
    assert not aw.sharding.is_fully_replicated

    single = train_lib.make_train_step(model, spec, cfg, tx, mesh=None)
    s_sd, m_sd = single(state2, jax.tree.map(jnp.asarray, batch))
    np.testing.assert_allclose(float(m_tp["loss/total"]),
                               float(m_sd["loss/total"]), rtol=1e-4)
    worst = max(
        float(jnp.abs(a - b).max()) for a, b in zip(
            jax.tree.leaves(s_tp.params), jax.tree.leaves(s_sd.params)))
    assert worst < 1e-4


def test_resume_from_checkpoint(rng, tmp_path):
    """Restart-resume is idempotent: train 4 = train 2 + resume to 4."""
    import itertools

    from attentionalpoolingaction_tpu import checkpoint as ckpt_lib

    cfg = cfg8(batch_size=4, mesh_shape=(1,), checkpoint_every=2)
    spec = get_dataset(cfg.dataset)
    batch = synth_batch(cfg, spec, rng)
    it = lambda: itertools.repeat(batch)

    sA, _ = train_lib.train(cfg, train_iter=it(), num_steps=4)

    mgr = ckpt_lib.make_manager(tmp_path / "ck")
    train_lib.train(cfg, train_iter=it(), num_steps=2,
                    checkpoint_manager=mgr)
    mgr.wait_until_finished()
    assert mgr.latest_step() == 2
    sB, _ = train_lib.train(cfg, train_iter=it(), num_steps=4,
                            checkpoint_manager=mgr)
    assert int(sB.step) == 4
    worst = max(
        float(jnp.abs(a - b).max()) for a, b in zip(
            jax.tree.leaves(sA.params), jax.tree.leaves(sB.params)))
    assert worst < 1e-5


def test_resume_under_mesh(rng, tmp_path):
    """Resume restores straight into mesh shardings: checkpoint written by
    an 8-way DP run resumes on the same mesh and matches the continuous
    run (VERDICT r1 weak #4)."""
    import itertools

    from attentionalpoolingaction_tpu import checkpoint as ckpt_lib

    cfg = cfg8(batch_size=8, mesh_shape=(8,), checkpoint_every=2)
    spec = get_dataset(cfg.dataset)
    batch = synth_batch(cfg, spec, rng)
    it = lambda: itertools.repeat(batch)

    sA, _ = train_lib.train(cfg, train_iter=it(), num_steps=4)

    mgr = ckpt_lib.make_manager(tmp_path / "ck_mesh")
    train_lib.train(cfg, train_iter=it(), num_steps=2,
                    checkpoint_manager=mgr)
    mgr.wait_until_finished()
    sB, _ = train_lib.train(cfg, train_iter=it(), num_steps=4,
                            checkpoint_manager=mgr)
    assert int(sB.step) == 4
    assert jax.tree.leaves(sB.params)[0].sharding.is_fully_replicated
    worst = max(
        float(jnp.abs(a - b).max()) for a, b in zip(
            jax.tree.leaves(sA.params), jax.tree.leaves(sB.params)))
    assert worst < 1e-5


def test_resume_under_2d_mesh_tp(rng, tmp_path):
    """Resume onto a (4,2) data x model mesh: the head restores SHARDED
    over the model axis and training continues to the same result."""
    import itertools

    from jax.sharding import PartitionSpec as P

    from attentionalpoolingaction_tpu import checkpoint as ckpt_lib

    cfg = cfg8(dataset="hico", batch_size=8, mesh_shape=(4, 2),
               mesh_axes=("data", "model"), checkpoint_every=2)
    spec = get_dataset(cfg.dataset)
    batch = synth_batch(cfg, spec, rng)
    it = lambda: itertools.repeat(batch)

    sA, _ = train_lib.train(cfg, train_iter=it(), num_steps=4)

    mgr = ckpt_lib.make_manager(tmp_path / "ck_tp")
    train_lib.train(cfg, train_iter=it(), num_steps=2,
                    checkpoint_manager=mgr)
    mgr.wait_until_finished()
    sB, _ = train_lib.train(cfg, train_iter=it(), num_steps=4,
                            checkpoint_manager=mgr)
    assert int(sB.step) == 4
    assert sB.params["head"]["attn_w"].sharding.spec == P(
        None, "model", None)
    worst = max(
        float(jnp.abs(a - b).max()) for a, b in zip(
            jax.tree.leaves(sA.params), jax.tree.leaves(sB.params)))
    assert worst < 1e-5


def test_resume_across_topologies(rng, tmp_path):
    """Slice-resize recovery: a checkpoint written under one mesh restores
    under a DIFFERENT topology (DP(8) -> data x model (4,2) -> single
    device), because restore targets carry the NEW run's shardings and
    Orbax reshards.  This is the real TPU preemption story — the replacement
    slice need not match the one that died."""
    import itertools

    from jax.sharding import PartitionSpec as P

    from attentionalpoolingaction_tpu import checkpoint as ckpt_lib

    cfg_dp = cfg8(dataset="hico", batch_size=8, checkpoint_every=2)
    spec = get_dataset(cfg_dp.dataset)
    batch = synth_batch(cfg_dp, spec, rng)
    it = lambda: itertools.repeat(batch)

    # continuous DP(8) run = the reference trajectory
    sA, _ = train_lib.train(cfg_dp, train_iter=it(), num_steps=4)

    # checkpoint at step 2 under DP(8)
    mgr = ckpt_lib.make_manager(tmp_path / "ck_topo")
    train_lib.train(cfg_dp, train_iter=it(), num_steps=2,
                    checkpoint_manager=mgr)
    mgr.wait_until_finished()

    # resume under (4,2) data x model: head restores SHARDED over a mesh
    # that did not exist when the checkpoint was written
    cfg_tp = cfg8(dataset="hico", batch_size=8, mesh_shape=(4, 2),
                  mesh_axes=("data", "model"), checkpoint_every=100)
    sB, _ = train_lib.train(cfg_tp, train_iter=it(), num_steps=4,
                            checkpoint_manager=mgr)
    assert int(sB.step) == 4
    assert sB.params["head"]["attn_w"].sharding.spec == P(
        None, "model", None)
    worst = max(
        float(jnp.abs(a - b).max()) for a, b in zip(
            jax.tree.leaves(sA.params), jax.tree.leaves(sB.params)))
    assert worst < 1e-4

    # and down to a single device (mesh_shape=None -> no mesh)
    cfg_1 = cfg8(dataset="hico", batch_size=8, mesh_shape=None,
                 checkpoint_every=100)
    sC, _ = train_lib.train(cfg_1, train_iter=it(), num_steps=4,
                            checkpoint_manager=mgr)
    assert int(sC.step) == 4
    worst = max(
        float(jnp.abs(a - b).max()) for a, b in zip(
            jax.tree.leaves(sA.params), jax.tree.leaves(sC.params)))
    assert worst < 1e-4


def test_evaluate_builds_mesh_from_config(rng, tmp_path):
    """evaluate()/Evaluator shard the eval forward over the config mesh
    (BASELINE.json config #5's 'multi-crop eval on TPU mesh' is reachable
    from the CLIs, not only when a mesh is passed programmatically)."""
    from jax.sharding import PartitionSpec as P

    from attentionalpoolingaction_tpu.data import records

    cfg = cfg8(batch_size=8, eval_batch_size=16, mesh_shape=(8,),
               eval_pattern=str(tmp_path / "val.tfrecord"))
    spec = get_dataset(cfg.dataset)
    records.write_synthetic_dataset(cfg.eval_pattern, spec, 20,
                                    image_size=80, seed=4)
    state, _, _, _ = train_lib.create_state(cfg)

    mesh = eval_lib.mesh_from_config(cfg)
    assert mesh is not None and mesh.shape == {"data": 8}
    # odd eval batch -> no mesh (padding guard)
    import dataclasses
    assert eval_lib.mesh_from_config(
        dataclasses.replace(cfg, eval_batch_size=6)) is None

    evaluator = eval_lib.Evaluator(cfg)
    assert evaluator.mesh is not None
    res_mesh = evaluator(state)
    res_single = eval_lib.evaluate(
        dataclasses.replace(cfg, mesh_shape=(1,)), state)
    assert res_mesh["num_examples"] == res_single["num_examples"] == 20
    np.testing.assert_allclose(res_mesh["mAP"], res_single["mAP"],
                               rtol=1e-6)


def test_grain_state_files_per_process_and_gc(rng, tmp_path):
    """Grain iterator state is per-process (grain_iter_<step>_p<i>.json)
    and files for Orbax-pruned steps are garbage-collected."""
    import itertools

    from attentionalpoolingaction_tpu import checkpoint as ckpt_lib

    cfg = cfg8(batch_size=4, mesh_shape=(1,), checkpoint_every=1)
    spec = get_dataset(cfg.dataset)
    batch = synth_batch(cfg, spec, rng)

    class FakeStatefulIter:
        def __init__(self):
            self.n = 0

        def __next__(self):
            self.n += 1
            return batch

        def __iter__(self):
            return self

        def get_state(self):
            return {"n": self.n}

        def set_state(self, s):
            self.n = s["n"]

    mgr = ckpt_lib.make_manager(tmp_path / "ck_grain", max_to_keep=2)
    it = FakeStatefulIter()
    train_lib.train(cfg, train_iter=it, num_steps=5,
                    checkpoint_manager=mgr)
    mgr.wait_until_finished()
    files = sorted(p.name for p in (tmp_path / "ck_grain").glob(
        "grain_iter_*.json"))
    kept = set(mgr.all_steps())
    assert files == sorted(f"grain_iter_{s}_p0.json" for s in kept)
    assert 5 in kept and 1 not in kept  # max_to_keep pruned early steps

    # resume picks up the per-process file.  The H2D prefetch wrapper may
    # PULL ahead of consumption (it2.n can exceed the consumed count), so
    # the contract to assert is the CHECKPOINTED state: step 6 must record
    # the consumed position n=6 (restored n=5 + the one batch step 6 ran)
    import json

    it2 = FakeStatefulIter()
    train_lib.train(cfg, train_iter=it2, num_steps=6,
                    checkpoint_manager=mgr)
    mgr.wait_until_finished()
    state6 = json.loads(
        (tmp_path / "ck_grain" / "grain_iter_6_p0.json").read_text())
    assert state6 == {"n": 6}
    assert it2.n >= 6                  # restored at n=5, pulled at least 1


def test_multicrop_eval_sharded(rng):
    """Crops fold into the sharded batch dim (BASELINE.json config #5)."""
    cfg = cfg8(eval_multicrop=3)
    state, _, model, _ = train_lib.create_state(cfg)
    mesh = mesh_lib.make_mesh((8,), ("data",))
    step = eval_lib.make_multicrop_eval_step(model, mesh)
    images = jnp.asarray(rng.normal(size=(8, 3, 64, 64, 3)), jnp.float32)
    images = jax.device_put(images, mesh_lib.batch_sharding(mesh))
    logits = step(state.params, state.batch_stats, images)
    assert logits.shape == (8, 393)
    # averaging over crops == manual mean of per-crop logits
    single = eval_lib.make_eval_step(model)
    flat = single(state.params, state.batch_stats,
                  np.asarray(images).reshape(24, 64, 64, 3))
    want = np.asarray(flat).reshape(8, 3, -1).mean(1)
    np.testing.assert_allclose(np.asarray(logits), want, rtol=2e-4, atol=2e-4)
