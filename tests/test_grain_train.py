"""Grain input pipeline driving the real train loop, including iterator
state checkpoint/resume (SURVEY.md section 5 checkpoint/resume row)."""

import numpy as np

from attentionalpoolingaction_tpu import checkpoint as ckpt_lib
from attentionalpoolingaction_tpu import train as train_lib
from attentionalpoolingaction_tpu.config import TrainConfig
from attentionalpoolingaction_tpu.data import records
from attentionalpoolingaction_tpu.data.datasets import get_dataset


def grain_cfg(path, **kw):
    base = dict(
        dataset="mpii", backbone="resnet_v1_50", pooling="attention",
        image_size=64, batch_size=4, bf16_backbone=False,
        learning_rate=1e-3, grad_clip_norm=10.0, lr_schedule="constant",
        input_pipeline="grain", train_pattern=path, resize_min=72,
        resize_max=90, log_every=1, checkpoint_every=2)
    base.update(kw)
    return TrainConfig(**base)


def test_grain_train_and_iterator_resume(tmp_path):
    spec = get_dataset("mpii")
    path = str(tmp_path / "train.tfrecord")
    records.write_synthetic_dataset(path, spec, 12, image_size=80)

    cfg = grain_cfg(path)
    mgr = ckpt_lib.make_manager(tmp_path / "ck")
    state, hist = train_lib.train(cfg, num_steps=2, checkpoint_manager=mgr)
    mgr.wait_until_finished()
    assert int(state.step) == 2
    assert np.isfinite(hist[-1]["loss/total"])
    iter_file = train_lib._grain_state_path(mgr, 2, 0)
    assert iter_file.exists()

    # resume: continues from step 2 AND restores the grain stream position
    state2, hist2 = train_lib.train(cfg, num_steps=4,
                                    checkpoint_manager=mgr)
    mgr.wait_until_finished()
    assert int(state2.step) == 4
    assert train_lib._grain_state_path(mgr, 4, 0).exists()


def test_tfdata_checkpoint_train_and_resume(tmp_path):
    """tfdata_checkpoint=True: the tf.data stream position is saved beside
    the model checkpoint and a restart resumes mid-epoch (the same
    state-file protocol the Grain path uses)."""
    spec = get_dataset("mpii")
    path = str(tmp_path / "train.tfrecord")
    records.write_synthetic_dataset(path, spec, 12, image_size=80)

    cfg = grain_cfg(path, input_pipeline="tfdata", tfdata_checkpoint=True)
    mgr = ckpt_lib.make_manager(tmp_path / "ck")
    state, hist = train_lib.train(cfg, num_steps=2, checkpoint_manager=mgr)
    mgr.wait_until_finished()
    assert int(state.step) == 2
    assert np.isfinite(hist[-1]["loss/total"])
    assert train_lib._grain_state_path(mgr, 2, 0).exists()

    state2, hist2 = train_lib.train(cfg, num_steps=4,
                                    checkpoint_manager=mgr)
    mgr.wait_until_finished()
    assert int(state2.step) == 4
    assert train_lib._grain_state_path(mgr, 4, 0).exists()


def test_data_echo_mid_echo_resume_matches_uninterrupted(tmp_path):
    """data_echo=2 with a checkpoint landing MID-echo (step 3 = phase 1):
    resume must replay the in-flight batch's remaining echo, so the
    resumed run's final params equal an uninterrupted run's exactly."""
    import jax

    spec = get_dataset("mpii")
    path = str(tmp_path / "train.tfrecord")
    records.write_synthetic_dataset(path, spec, 12, image_size=80)

    cfg = grain_cfg(path, data_echo=2, checkpoint_every=3)

    mgr_a = ckpt_lib.make_manager(tmp_path / "a")
    state_a, _ = train_lib.train(cfg, num_steps=6, checkpoint_manager=mgr_a)
    mgr_a.wait_until_finished()

    mgr_b = ckpt_lib.make_manager(tmp_path / "b")
    train_lib.train(cfg, num_steps=3, checkpoint_manager=mgr_b)
    mgr_b.wait_until_finished()
    # the saved iterator state carries a mid-echo phase
    import json
    saved = json.loads(train_lib._grain_state_path(
        mgr_b, 3, 0).read_text())
    assert set(saved) == {"inner_before", "phase"} and saved["phase"] == 1
    state_b, _ = train_lib.train(cfg, num_steps=6, checkpoint_manager=mgr_b)
    mgr_b.wait_until_finished()

    assert int(state_a.step) == int(state_b.step) == 6
    worst = max(float(np.abs(np.asarray(x) - np.asarray(y)).max())
                for x, y in zip(jax.tree.leaves(state_a.params),
                                jax.tree.leaves(state_b.params)))
    assert worst == 0.0, worst


def test_data_echo_toggle_across_resume(tmp_path):
    """Turning data_echo OFF at a mid-echo checkpoint resumes from the
    inner stream position (remaining echoes dropped, logged) instead of
    crashing on the wrapped state format."""
    spec = get_dataset("mpii")
    path = str(tmp_path / "train.tfrecord")
    records.write_synthetic_dataset(path, spec, 12, image_size=80)

    mgr = ckpt_lib.make_manager(tmp_path / "ck")
    train_lib.train(grain_cfg(path, data_echo=2, checkpoint_every=3),
                    num_steps=3, checkpoint_manager=mgr)
    mgr.wait_until_finished()
    state, hist = train_lib.train(grain_cfg(path, checkpoint_every=3),
                                  num_steps=5, checkpoint_manager=mgr)
    mgr.wait_until_finished()
    assert int(state.step) == 5
    assert np.isfinite(hist[-1]["loss/total"])
