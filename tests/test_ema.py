"""Parameter EMA (config.ema_decay — slim's moving_average_decay):
update math vs a NumPy mirror, eval/serving with the shadow weights,
checkpoint roundtrip, and the disabled-by-default contract."""

import itertools

import jax
import numpy as np
import pytest

from attentionalpoolingaction_tpu import checkpoint as ckpt_lib
from attentionalpoolingaction_tpu import evaluate as eval_lib
from attentionalpoolingaction_tpu import serving
from attentionalpoolingaction_tpu import train as train_lib
from attentionalpoolingaction_tpu.config import TrainConfig
from attentionalpoolingaction_tpu.data import pipeline, records
from attentionalpoolingaction_tpu.data.datasets import get_dataset


def tiny_cfg(**kw):
    base = dict(
        dataset="mpii", backbone="resnet_v1_50", pooling="attention",
        rank=1, image_size=64, batch_size=4, bf16_backbone=False,
        learning_rate=1e-2, grad_clip_norm=10.0, log_every=1,
        lr_schedule="constant", resize_min=72, resize_max=90)
    base.update(kw)
    return TrainConfig(**base)


def _batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "image": rng.normal(size=(cfg.batch_size, cfg.image_size,
                                  cfg.image_size, 3)).astype(np.float32),
        "label": rng.integers(0, 393, (cfg.batch_size,), np.int32),
    }


def test_ema_update_matches_numpy_mirror():
    """EMA follows TF ExponentialMovingAverage(decay, num_updates=step):
    effective decay min(decay, (1+t)/(10+t)) — the warmup cap binds for
    early steps (t=1: 2/11 < 0.9), then the configured decay takes over
    once t grows.  Verified leaf-for-leaf against a NumPy recurrence over
    the actual per-step params."""
    cfg = tiny_cfg(ema_decay=0.25)   # below the cap from t=2 on: binds
    state, spec, model, tx = train_lib.create_state(cfg)
    assert state.ema_params is not None
    step_fn = train_lib.make_train_step(model, spec, cfg, tx)

    flat = jax.tree_util.tree_leaves(state.params)
    ema_np = [np.asarray(x, np.float64) for x in flat]
    batch = _batch(cfg)
    for t in range(1, 4):
        state, _ = step_fn(state, batch)
        d = min(cfg.ema_decay, (1.0 + t) / (10.0 + t))
        params_np = [np.asarray(x, np.float64)
                     for x in jax.tree_util.tree_leaves(state.params)]
        ema_np = [e * d + p * (1.0 - d)
                  for e, p in zip(ema_np, params_np)]
    got = jax.tree_util.tree_leaves(state.ema_params)
    assert len(got) == len(ema_np)
    for g, e in zip(got, ema_np):
        np.testing.assert_allclose(np.asarray(g, np.float64), e,
                                   rtol=1e-5, atol=1e-7)
    # warmup cap check: at t=1 the effective decay is 2/11, NOT 0.9 —
    # rerun one step with a large decay and confirm EMA moved well past
    # what decay=0.9 alone would allow
    cfg2 = tiny_cfg(ema_decay=0.9)
    s2, spec2, model2, tx2 = train_lib.create_state(cfg2)
    init_leaves = [np.asarray(x, np.float64)
                   for x in jax.tree_util.tree_leaves(s2.params)]
    step2 = train_lib.make_train_step(model2, spec2, cfg2, tx2)
    s2, _ = step2(s2, batch)
    d1 = 2.0 / 11.0
    p1 = [np.asarray(x, np.float64)
          for x in jax.tree_util.tree_leaves(s2.params)]
    want = [i * d1 + p * (1 - d1) for i, p in zip(init_leaves, p1)]
    for g, w in zip(jax.tree_util.tree_leaves(s2.ema_params), want):
        np.testing.assert_allclose(np.asarray(g, np.float64), w,
                                   rtol=1e-5, atol=1e-7)


def test_ema_disabled_by_default():
    cfg = tiny_cfg()
    state, spec, model, tx = train_lib.create_state(cfg)
    assert state.ema_params is None
    step_fn = train_lib.make_train_step(model, spec, cfg, tx)
    state, _ = step_fn(state, _batch(cfg))
    assert state.ema_params is None
    with pytest.raises(ValueError, match="ema_params"):
        eval_lib.evaluate(tiny_cfg(eval_ema=True), state,
                          eval_iter=iter(()))


def test_eval_ema_uses_shadow_weights(tmp_path):
    """evaluate(eval_ema=True) must score the EMA weights: identical to
    evaluating a state whose params ARE the ema tree, and different from
    the raw-params eval once the trees diverge."""
    spec = get_dataset("mpii")
    val_p = str(tmp_path / "val.tfrecord")
    records.write_synthetic_dataset(val_p, spec, 8, image_size=80, seed=1)
    cfg = tiny_cfg(eval_pattern=val_p, eval_batch_size=4, ema_decay=0.25)
    state, _, model, tx = train_lib.create_state(cfg)
    step_fn = train_lib.make_train_step(model, get_dataset("mpii"), cfg, tx)
    for _ in range(3):
        state, _ = step_fn(state, _batch(cfg))

    def ev(c, s):
        return eval_lib.evaluate(c, s, eval_iter=pipeline.make_eval_iterator(
            val_p, spec, batch_size=4, image_size=64, resize_min=72))

    import dataclasses

    res_ema = ev(dataclasses.replace(cfg, eval_ema=True), state)
    res_raw = ev(cfg, state)
    res_manual = ev(cfg, state.replace(params=state.ema_params))
    assert res_ema["mAP"] == res_manual["mAP"]
    assert res_ema["mAP"] != res_raw["mAP"]   # trees diverged by step 3


def test_ema_trains_on_mesh():
    """EMA leaves ride the same sharding derivation as params (they pass
    through state_shardings' tree_map), so the mesh train step must
    compile and update them."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    cfg = tiny_cfg(ema_decay=0.25, mesh_shape=(8,), batch_size=8)
    state, _ = train_lib.train(cfg, train_iter=itertools.repeat(
        _batch(cfg)), num_steps=2)
    assert state.ema_params is not None
    p = jax.tree_util.tree_leaves(state.params)[0]
    e = jax.tree_util.tree_leaves(state.ema_params)[0]
    assert np.all(np.isfinite(np.asarray(e)))
    assert not np.array_equal(np.asarray(p), np.asarray(e))


def test_ema_checkpoint_roundtrip_and_serving(tmp_path):
    """ema_params survives Orbax save -> restore_for_eval, feeds
    load_predictor(use_ema=True), and old-style checkpoints (no EMA)
    raise a clear error instead of silently serving raw params."""
    spec = get_dataset("mpii")
    train_p = str(tmp_path / "train.tfrecord")
    records.write_synthetic_dataset(train_p, spec, 8, image_size=80)
    cfg = tiny_cfg(ema_decay=0.5, workdir=str(tmp_path / "run"),
                   checkpoint_every=2)
    mgr = ckpt_lib.make_manager(cfg.workdir + "/checkpoints")
    it = pipeline.make_train_iterator(
        train_p, spec, batch_size=4, image_size=64, resize_min=72,
        resize_max=90, shard_by_process=False)
    state, _ = train_lib.train(cfg, train_iter=it, num_steps=2,
                               checkpoint_manager=mgr)
    mgr.wait_until_finished()
    restored = ckpt_lib.restore_for_eval(mgr)
    assert restored.ema_params is not None
    for a, b in zip(jax.tree_util.tree_leaves(restored.ema_params),
                    jax.tree_util.tree_leaves(state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    pred = serving.load_predictor(cfg, buckets=(2,), use_ema=True)
    img = np.zeros((1, 64, 64, 3), np.uint8)
    probs_ema = pred.predict_arrays(img)
    probs_raw = serving.load_predictor(
        cfg, buckets=(2,)).predict_arrays(img)
    assert probs_ema.shape == (1, 393)
    assert not np.array_equal(probs_ema, probs_raw)

    # resume must carry the EMA forward, not reinit it
    it2 = pipeline.make_train_iterator(
        train_p, spec, batch_size=4, image_size=64, resize_min=72,
        resize_max=90, shard_by_process=False)
    state2, _ = train_lib.train(cfg, train_iter=it2, num_steps=3,
                                checkpoint_manager=mgr)
    assert int(state2.step) == 3

    # old-style checkpoint (no EMA): loud failure on use_ema
    cfg_old = tiny_cfg(workdir=str(tmp_path / "run_old"),
                       checkpoint_every=1)
    mgr2 = ckpt_lib.make_manager(cfg_old.workdir + "/checkpoints")
    it3 = pipeline.make_train_iterator(
        train_p, spec, batch_size=4, image_size=64, resize_min=72,
        resize_max=90, shard_by_process=False)
    train_lib.train(cfg_old, train_iter=it3, num_steps=1,
                    checkpoint_manager=mgr2)
    mgr2.wait_until_finished()
    assert ckpt_lib.restore_for_eval(mgr2).ema_params is None
    with pytest.raises(ValueError, match="ema_params"):
        serving.load_predictor(cfg_old, buckets=(2,), use_ema=True)


def test_eval_ema_composes_with_int8(tmp_path):
    """eval_ema=True + eval_int8=True quantizes the EMA weights (params
    are swapped before the int8 fold): identical to int8-evaluating a
    state whose params ARE the ema tree, and different from int8 over
    the raw params."""
    import dataclasses

    spec = get_dataset("mpii")
    val_p = str(tmp_path / "val.tfrecord")
    records.write_synthetic_dataset(val_p, spec, 8, image_size=80, seed=3)
    cfg = tiny_cfg(eval_pattern=val_p, eval_batch_size=4, ema_decay=0.25)
    state, _, model, tx = train_lib.create_state(cfg)
    step_fn = train_lib.make_train_step(model, get_dataset("mpii"), cfg, tx)
    for _ in range(3):
        state, _ = step_fn(state, _batch(cfg))

    def ev(c, s):
        return eval_lib.evaluate(c, s, eval_iter=pipeline.make_eval_iterator(
            val_p, spec, batch_size=4, image_size=64, resize_min=72))

    cfg8 = dataclasses.replace(cfg, eval_int8=True)
    res_both = ev(dataclasses.replace(cfg8, eval_ema=True), state)
    res_manual = ev(cfg8, state.replace(params=state.ema_params))
    res_raw8 = ev(cfg8, state)
    assert res_both["mAP"] == res_manual["mAP"]
    assert res_both["mAP"] != res_raw8["mAP"]


def test_ema_toggle_across_resume(tmp_path):
    """ema_decay may be flipped between runs sharing a workdir; restore
    must reconcile the tree-structure mismatch instead of raising Orbax's
    opaque 'structures do not match'.  off->on seeds the EMA from the
    restored params; on->off drops the saved EMA (with a warning)."""
    spec = get_dataset("mpii")
    train_p = str(tmp_path / "train.tfrecord")
    records.write_synthetic_dataset(train_p, spec, 8, image_size=80)
    wd = str(tmp_path / "run")

    def it():
        return pipeline.make_train_iterator(
            train_p, spec, batch_size=4, image_size=64, resize_min=72,
            resize_max=90, shard_by_process=False)

    cfg_off = tiny_cfg(workdir=wd, checkpoint_every=2)
    cfg_on = tiny_cfg(workdir=wd, checkpoint_every=2, ema_decay=0.25)
    mgr = ckpt_lib.make_manager(wd + "/checkpoints")

    state0, _ = train_lib.train(cfg_off, train_iter=it(), num_steps=2,
                                checkpoint_manager=mgr)
    mgr.wait_until_finished()
    assert "ema_params" not in ckpt_lib.saved_tree_keys(mgr)

    # off -> on: EMA appears, seeded from the step-2 params then updated.
    # Recompute the expected EMA with the warmup-capped decay recurrence
    # starting FROM the restored params (not from init).
    state1, _ = train_lib.train(cfg_on, train_iter=it(), num_steps=4,
                                checkpoint_manager=mgr)
    mgr.wait_until_finished()
    assert int(state1.step) == 4
    assert state1.ema_params is not None
    assert "ema_params" in ckpt_lib.saved_tree_keys(mgr)
    seed = [np.asarray(x, np.float64)
            for x in jax.tree_util.tree_leaves(state0.params)]
    saw = jax.tree_util.tree_leaves(state1.ema_params)
    # the exact per-step params aren't cheaply replayable (iterator state
    # differs), so check the seeding property instead: the EMA diverged
    # from BOTH endpoints (the step-2 seed and the step-4 params), i.e. it
    # tracked from the resume point rather than being a copy of either.
    fin = [np.asarray(x, np.float64)
           for x in jax.tree_util.tree_leaves(state1.params)]
    assert not all(np.array_equal(np.asarray(a, np.float64), b)
                   for a, b in zip(saw, fin))
    assert not all(np.array_equal(np.asarray(a, np.float64), b)
                   for a, b in zip(saw, seed))

    # on -> off: resume drops EMA, continues, and re-saves without it
    state2, _ = train_lib.train(cfg_off, train_iter=it(), num_steps=6,
                                checkpoint_manager=mgr)
    mgr.wait_until_finished()
    assert int(state2.step) == 6
    assert state2.ema_params is None
    assert "ema_params" not in ckpt_lib.saved_tree_keys(mgr)
