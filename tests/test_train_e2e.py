"""End-to-end integration: synthetic TFRecords -> pipeline -> jit train step
-> Orbax save/restore -> eval metrics (SURVEY.md section 4 item 3; the
CPU-runnable BASELINE.json config #1 shape).

Uses a small ResNet-50 at 64px so the whole loop runs on CPU in seconds.
"""


import jax
import numpy as np
import pytest

from attentionalpoolingaction_tpu import checkpoint as ckpt_lib
from attentionalpoolingaction_tpu import evaluate as eval_lib
from attentionalpoolingaction_tpu import train as train_lib
from attentionalpoolingaction_tpu.config import TrainConfig
from attentionalpoolingaction_tpu.data import pipeline, records
from attentionalpoolingaction_tpu.data.datasets import get_dataset


def tiny_cfg(**kw):
    base = dict(
        dataset="mpii", backbone="resnet_v1_50", pooling="attention",
        rank=1, image_size=64, batch_size=4, bf16_backbone=False,
        learning_rate=1e-3, grad_clip_norm=10.0, log_every=1, num_steps=3,
        lr_schedule="constant")
    base.update(kw)
    return TrainConfig(**base)


@pytest.fixture(scope="module")
def mpii_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("mpii")
    spec = get_dataset("mpii")
    train_p = str(d / "train.tfrecord")
    val_p = str(d / "val.tfrecord")
    records.write_synthetic_dataset(train_p, spec, 16, image_size=80, seed=0)
    records.write_synthetic_dataset(val_p, spec, 10, image_size=80, seed=1)
    return train_p, val_p


def make_iter(path, cfg, train=True):
    spec = get_dataset(cfg.dataset)
    if train:
        return pipeline.make_train_iterator(
            path, spec, batch_size=cfg.batch_size, image_size=cfg.image_size,
            resize_min=72, resize_max=90, shard_by_process=False)
    return pipeline.make_eval_iterator(
        path, spec, batch_size=cfg.eval_batch_size,
        image_size=cfg.image_size, resize_min=72)


def test_train_loss_decreases(mpii_files):
    """Overfit a single fixed batch: loss must decrease deterministically."""
    import itertools

    train_p, _ = mpii_files
    cfg = tiny_cfg(num_steps=8)
    batch = next(make_iter(train_p, cfg))
    state, history = train_lib.train(
        cfg, train_iter=itertools.repeat(batch), num_steps=8)
    assert int(state.step) == 8
    losses = [h["loss/total"] for h in history]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_pose_attention_train(mpii_files):
    train_p, _ = mpii_files
    cfg = tiny_cfg(pooling="pose_attention", num_steps=2)
    state, history = train_lib.train(
        cfg, train_iter=make_iter(train_p, cfg), num_steps=2)
    assert "loss/pose" in history[-1]
    assert np.isfinite(history[-1]["loss/pose"])


def test_eval_metrics(mpii_files):
    _, val_p = mpii_files
    cfg = tiny_cfg()
    state = train_lib.create_state(cfg)[0]
    results = eval_lib.evaluate(cfg, state,
                                eval_iter=make_iter(val_p, cfg, train=False))
    assert results["num_examples"] == 10
    assert 0.0 <= results["mAP"] <= 1.0
    assert 0.0 <= results["accuracy"] <= 1.0


def test_checkpoint_roundtrip(mpii_files, tmp_path):
    train_p, _ = mpii_files
    cfg = tiny_cfg(num_steps=2)
    mgr = ckpt_lib.make_manager(tmp_path / "ckpt")
    state, _ = train_lib.train(
        cfg, train_iter=make_iter(train_p, cfg), num_steps=2,
        checkpoint_manager=mgr)
    mgr.wait_until_finished()
    assert mgr.latest_step() == 2

    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
    restored = ckpt_lib.restore(mgr, abstract)
    assert int(restored.step) == 2
    orig = jax.tree.leaves(state.params)
    rest = jax.tree.leaves(restored.params)
    for a, b in zip(orig, rest):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hmdb_end_to_end(tmp_path):
    spec = get_dataset("hmdb51")
    p = str(tmp_path / "h.tfrecord")
    records.write_synthetic_dataset(p, spec, 12, image_size=80,
                                    frames_per_video=3)
    cfg = tiny_cfg(dataset="hmdb51", num_steps=2)
    it = pipeline.make_train_iterator(
        p, spec, batch_size=4, image_size=64, resize_min=72, resize_max=90,
        shard_by_process=False)
    state, _ = train_lib.train(cfg, train_iter=it, num_steps=2)
    ev = pipeline.make_eval_iterator(p, spec, batch_size=4, image_size=64,
                                     resize_min=72)
    results = eval_lib.evaluate(cfg, state, eval_iter=ev)
    assert results["num_videos"] == 4
    assert "accuracy" in results and "per_frame_accuracy" in results


def test_video_sampling_tfdata_end_to_end(tmp_path):
    """hmdb51 + tfdata + video_frame_sampling trains via the per-epoch
    group_by_window sampler (protocol parity with the grain path —
    VERDICT r2 next #7); only the tfdata_checkpoint combo is rejected."""
    spec = get_dataset("hmdb51")
    p = str(tmp_path / "h.tfrecord")
    records.write_synthetic_dataset(p, spec, 6, image_size=80,
                                    frames_per_video=3)
    cfg = tiny_cfg(dataset="hmdb51", train_pattern=p, num_steps=1,
                   input_pipeline="tfdata", video_frame_sampling=True,
                   batch_size=2, resize_min=72, resize_max=90)
    state, _ = train_lib.train(cfg, num_steps=1)
    assert int(state.step) == 1
    # exact mid-epoch resume of the sampler needs grain: hard error
    cfg2 = tiny_cfg(dataset="hmdb51", train_pattern=p, num_steps=1,
                    input_pipeline="tfdata", video_frame_sampling=True,
                    tfdata_checkpoint=True)
    with pytest.raises(ValueError, match="grain"):
        train_lib.train(cfg2, num_steps=1)


def test_hico_multilabel_loss(tmp_path):
    spec = get_dataset("hico")
    p = str(tmp_path / "hico.tfrecord")
    records.write_synthetic_dataset(p, spec, 8, image_size=80)
    cfg = tiny_cfg(dataset="hico", num_steps=2)
    it = pipeline.make_train_iterator(
        p, spec, batch_size=4, image_size=64, resize_min=72, resize_max=90,
        shard_by_process=False)
    state, history = train_lib.train(cfg, train_iter=it, num_steps=2)
    assert np.isfinite(history[-1]["loss/total"])


def test_preemption_stop_event_checkpoints_and_resumes(mpii_files, tmp_path):
    """Preemption-safe shutdown: setting stop_event (what the SIGTERM
    handler does) checkpoints at the CURRENT step — not a checkpoint_every
    multiple — exits the loop cleanly, and a restart resumes from there."""
    import threading

    train_p, _ = mpii_files
    cfg = tiny_cfg(train_pattern=train_p, resize_min=72, resize_max=90,
                   checkpoint_every=100)
    mgr = ckpt_lib.make_manager(tmp_path / "ck")
    stop = threading.Event()

    def preempt_at_3(step, state, metrics):
        if step == 3:
            stop.set()

    state, hist = train_lib.train(
        cfg, num_steps=50, checkpoint_manager=mgr, hooks=(preempt_at_3,),
        stop_event=stop)
    mgr.wait_until_finished()
    assert int(state.step) == 3
    assert mgr.latest_step() == 3

    state2, _ = train_lib.train(cfg, num_steps=5, checkpoint_manager=mgr)
    mgr.wait_until_finished()
    assert int(state2.step) == 5
