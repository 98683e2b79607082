"""Clip-level spatiotemporal attentional pooling (TPU-native extension;
config.clip_frames).

A 5-D (B, T, H, W, C) batch runs the backbone per-frame and pools over
all T*h*w positions in one second-order form — per-video logits without
the reference protocol's post-hoc frame averaging (SURVEY.md section 1
L2 'HMDB adds frame sampling' is the per-frame baseline; this is the
beyond-reference video mode).
"""

import numpy as np
import pytest

from attentionalpoolingaction_tpu import config as config_lib
from attentionalpoolingaction_tpu.data import records as rec
from attentionalpoolingaction_tpu.data.datasets import get_dataset
from attentionalpoolingaction_tpu.models.factory import get_model


@pytest.fixture(scope="module")
def hmdb_records(tmp_path_factory):
    d = tmp_path_factory.mktemp("clip_hmdb")
    path = str(d / "train.tfrecord")
    spec = get_dataset("hmdb51")
    # 16 frame records = 4 videos x 4 frames
    rec.write_synthetic_dataset(path, spec, 16, image_size=60, seed=0,
                                frames_per_video=4)
    return path, spec


# ---------------------------------------------------------------- model


def test_clip_forward_matches_concatenated_frame_features(rng):
    """The clip forward must equal: per-frame backbone features,
    concatenated along positions, through the same pooling params — i.e.
    folding T into the feature-map height IS spatiotemporal pooling, not
    an approximation."""
    import jax
    import jax.numpy as jnp

    from attentionalpoolingaction_tpu.ops import attn_pool as ap_ops

    model = get_model("resnet_v1_50", num_classes=7, pooling="attention",
                      rank=2, dtype=jnp.float32)
    clip = jnp.asarray(rng.normal(size=(2, 3, 64, 64, 3)), jnp.float32)
    # init on a SINGLE-FRAME batch: param shapes must be position-count
    # agnostic so image-trained checkpoints load into clip mode
    variables = model.init(jax.random.key(0), clip[:, 0], train=False)

    out = model.apply(variables, clip)
    assert out["logits"].shape == (2, 7)

    frames = model.apply(variables, clip.reshape(6, 64, 64, 3))
    f = frames["features"]                      # (B*T, h, w, F)
    x = f.reshape(2, 3 * f.shape[1] * f.shape[2], f.shape[3])
    head = variables["params"]["head"]
    want = ap_ops.attentional_pool(
        x, head["attn_w"], head["attn_b"], head["sal_w"], head["sal_b"])
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(want), rtol=2e-5, atol=2e-5)


def test_clip_avg_pooling_is_mean_of_frame_logits(rng):
    """With the linear avg-pool head, clip logits == mean of per-frame
    logits (equal position counts per frame)."""
    import jax
    import jax.numpy as jnp

    model = get_model("resnet_v1_50", num_classes=5, pooling="avg",
                      dtype=jnp.float32)
    clip = jnp.asarray(rng.normal(size=(2, 4, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), clip[:, 0], train=False)
    clip_logits = model.apply(variables, clip)["logits"]
    frame_logits = model.apply(
        variables, clip.reshape(8, 64, 64, 3))["logits"].reshape(2, 4, 5)
    np.testing.assert_allclose(np.asarray(clip_logits),
                               np.asarray(frame_logits.mean(axis=1)),
                               rtol=2e-5, atol=2e-5)


def test_clip_attention_maps_per_frame(rng):
    import jax
    import jax.numpy as jnp

    model = get_model("resnet_v1_50", num_classes=5, pooling="attention",
                      rank=1, dtype=jnp.float32)
    clip = jnp.asarray(rng.normal(size=(1, 3, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), clip[:, 0], train=False)
    out = model.apply(variables, clip, return_maps=True)
    fs = out["features"].shape[2]               # w of the feature map
    assert out["attn_maps"].shape == (1, 3, fs, fs, 5)
    assert out["saliency"].shape == (1, 3, fs, fs)


def test_clip_pose_pooling_rejected(rng):
    import jax
    import jax.numpy as jnp

    model = get_model("resnet_v1_50", num_classes=5,
                      pooling="pose_attention", dtype=jnp.float32)
    clip = jnp.zeros((1, 2, 64, 64, 3), jnp.float32)
    with pytest.raises(ValueError, match="pose_attention"):
        model.init(jax.random.key(0), clip, train=False)


# ----------------------------------------------------------------- data


def test_segment_picks_ordering_and_coverage():
    from attentionalpoolingaction_tpu.data import grain_pipeline as gp

    # eval (deterministic centers): ordered, in range, spans the video
    picks = gp._segment_picks(25, 8)
    assert picks == sorted(picks)
    assert all(0 <= p < 25 for p in picks)
    assert len(set(picks)) == 8
    # short video: frames repeat but stay ordered and static-shaped
    picks = gp._segment_picks(3, 8)
    assert len(picks) == 8
    assert picks == sorted(picks)
    assert all(0 <= p < 3 for p in picks)
    # training: each pick stays inside its own segment (temporal order)
    r = np.random.default_rng(0)
    for _ in range(20):
        picks = gp._segment_picks(25, 8, r)
        assert picks == sorted(picks)
        assert all(0 <= p < 25 for p in picks)


def test_clip_train_dataset(hmdb_records):
    from attentionalpoolingaction_tpu.data import grain_pipeline as gp

    path, spec = hmdb_records
    ds = gp.make_video_train_dataset(
        path, spec, batch_size=2, image_size=48, resize_min=52,
        resize_max=56, seed=0, clip_frames=3)
    b = next(iter(ds))
    assert b["image"].shape == (2, 3, 48, 48, 3)
    assert b["image"].dtype == np.float32
    assert b["label"].shape == (2,)
    assert b["video_id"].shape == (2,)
    assert b["transform"].shape == (2, 5)      # ONE shared transform/clip
    # frames are temporally ordered within each clip
    assert b["frame"].shape == (2, 3)
    for row in b["frame"]:
        assert list(row) == sorted(row)


def test_clip_train_uint8_transfer(hmdb_records):
    from attentionalpoolingaction_tpu.data import grain_pipeline as gp

    path, spec = hmdb_records
    ds = gp.make_video_train_dataset(
        path, spec, batch_size=2, image_size=48, resize_min=52,
        seed=0, clip_frames=2, transfer_uint8=True)
    b = next(iter(ds))
    assert b["image"].dtype == np.uint8


def test_clip_eval_dataset_one_row_per_video(hmdb_records):
    from attentionalpoolingaction_tpu.data import grain_pipeline as gp

    path, spec = hmdb_records
    ds = gp.make_video_clip_eval_dataset(
        path, spec, batch_size=3, image_size=48, resize_min=52,
        clip_frames=4)
    batches = list(ds)
    vids = np.concatenate([b["video_id"] for b in batches])
    masks = np.concatenate([b["mask"] for b in batches])
    assert masks.sum() == 4                    # 4 videos, once each
    assert sorted(vids[masks.astype(bool)].tolist()) == [0, 1, 2, 3]
    assert batches[0]["image"].shape == (3, 4, 48, 48, 3)
    # deterministic: a second pass is identical
    again = list(ds)
    np.testing.assert_array_equal(batches[0]["image"], again[0]["image"])


def test_clip_eval_sharding_partitions_videos(hmdb_records):
    from attentionalpoolingaction_tpu.data import grain_pipeline as gp

    path, spec = hmdb_records
    seen = []
    for shard in range(2):
        ds = gp.make_video_clip_eval_dataset(
            path, spec, batch_size=2, image_size=48, resize_min=52,
            clip_frames=2, shard_index=shard, shard_count=2)
        vids, masks = [], []
        for b in ds:
            vids.append(b["video_id"])
            masks.append(b["mask"])
        m = np.concatenate(masks).astype(bool)
        seen.append(set(np.concatenate(vids)[m].tolist()))
    assert seen[0] | seen[1] == {0, 1, 2, 3}
    assert not (seen[0] & seen[1])


def test_multiclip_eval_rows_and_averaging(hmdb_records):
    """eval_clips=K emits K deterministic rows per video (distinct
    temporal offsets, same video_id) and the standard per-video averaging
    combines them into one prediction per video."""
    from attentionalpoolingaction_tpu.data import grain_pipeline as gp
    from attentionalpoolingaction_tpu.ops import metrics as metrics_lib

    path, spec = hmdb_records
    ds = gp.make_video_clip_eval_dataset(
        path, spec, batch_size=4, image_size=48, resize_min=52,
        clip_frames=2, num_clips=3)
    vids, masks, frames = [], [], []
    for b in ds:
        vids.append(b["video_id"])
        masks.append(b["mask"])
        frames.append(b["frame"])
    m = np.concatenate(masks).astype(bool)
    vids = np.concatenate(vids)[m]
    frames = np.concatenate(frames)[m]
    assert m.sum() == 12                       # 4 videos x 3 clips
    counts = {v: int((vids == v).sum()) for v in set(vids.tolist())}
    assert counts == {0: 3, 1: 3, 2: 3, 3: 3}
    # the K clips of one video differ temporally (4 frames, 2 segments:
    # fractions 1/6, 3/6, 5/6 of each 2-frame segment -> not all equal)
    per_vid = {v: {tuple(f) for f, vv in zip(frames, vids) if vv == v}
               for v in set(vids.tolist())}
    assert all(len(s) > 1 for s in per_vid.values())
    # per-video averaging collapses K rows to one prediction per video
    logits = np.asarray(
        np.random.default_rng(0).normal(size=(12, spec.num_classes)),
        np.float32)
    uv, avg, _ = metrics_lib.video_average_logits(
        vids, logits, np.zeros(12, np.int32))
    assert len(uv) == 4 and avg.shape == (4, spec.num_classes)


def test_multiclip_eval_e2e(hmdb_records, tmp_path):
    """evaluate() with eval_clips: num_examples = videos*clips but
    num_videos/accuracy stay per-video; eval_clips=1 equals the
    single-clip result exactly (same segment centers)."""
    import dataclasses

    from attentionalpoolingaction_tpu import evaluate as eval_lib
    from attentionalpoolingaction_tpu import train as train_lib

    path, _ = hmdb_records
    cfg = config_lib.get_config(
        "hmdb51_clip8", backbone="resnet_v1_50", clip_frames=2,
        image_size=64, batch_size=2, eval_batch_size=2, resize_min=70,
        bf16_backbone=False, eval_pattern=path,
        workdir=str(tmp_path / "mc"))
    state, _, _, _ = train_lib.create_state(cfg)
    res1 = eval_lib.evaluate(cfg, state)
    res3 = eval_lib.evaluate(
        dataclasses.replace(cfg, eval_clips=3), state)
    assert res1["num_examples"] == 4 and res3["num_examples"] == 12
    assert res1["num_videos"] == res3["num_videos"] == 4
    assert 0.0 <= res3["accuracy"] <= 1.0


def test_clip_crop_frac_matches_eval_multicrop():
    """preprocess_clip_np(crop_frac=j/(N-1)) places the shared crop at
    exactly eval_multicrop_np's crop j — the spatial multi-crop clip
    protocol reuses the image protocol's geometry, frame for frame."""
    import cv2

    from attentionalpoolingaction_tpu.data import preprocessing_np as ppnp

    img = np.random.default_rng(0).integers(
        0, 256, size=(90, 120, 3), dtype=np.uint8)
    ok, enc = cv2.imencode(".jpg", img)
    assert ok
    b = enc.tobytes()

    crops = ppnp.eval_multicrop_np(
        b, out_size=48, resize_min=56, num_crops=3)
    for j in range(3):
        clip, _ = ppnp.preprocess_clip_np(
            [b, b], out_size=48, is_training=False, resize_min=56,
            crop_frac=j / 2)
        np.testing.assert_array_equal(np.asarray(clip[0]), crops[j])
        np.testing.assert_array_equal(np.asarray(clip[1]), crops[j])
    # crops genuinely differ when there is spare extent to place them in
    assert not np.array_equal(crops[0], crops[2])


def test_clip_multicrop_rows(hmdb_records):
    """num_crops=N emits clips*N rows per video (same video_id, same
    temporal picks per clip, distinct spatial placements)."""
    from attentionalpoolingaction_tpu.data import grain_pipeline as gp

    path, spec = hmdb_records
    ds = gp.make_video_clip_eval_dataset(
        path, spec, batch_size=4, image_size=48, resize_min=64,
        clip_frames=2, num_clips=2, num_crops=3)
    vids, masks, imgs = [], [], []
    for b in ds:
        vids.append(b["video_id"])
        masks.append(b["mask"])
        imgs.append(b["image"])
    m = np.concatenate(masks).astype(bool)
    vids = np.concatenate(vids)[m]
    imgs = np.concatenate(imgs)[m]
    assert m.sum() == 24                   # 4 videos x 2 clips x 3 crops
    counts = {v: int((vids == v).sum()) for v in set(vids.tolist())}
    assert counts == {0: 6, 1: 6, 2: 6, 3: 6}
    # within one video's first clip, the 3 crops are spatially distinct
    first_vid = imgs[vids == 0][:3]
    assert not np.array_equal(first_vid[0], first_vid[1])
    assert not np.array_equal(first_vid[0], first_vid[2])


def test_clip_multicrop_eval_e2e(hmdb_records, tmp_path):
    """evaluate() composes clip_frames x eval_clips x eval_multicrop:
    num_examples = videos*clips*crops, per-video metrics unchanged in
    count; and with no spare crop extent (resize_min == image_size) the
    3 identical crops average to EXACTLY the single-crop result."""
    import dataclasses

    from attentionalpoolingaction_tpu import evaluate as eval_lib
    from attentionalpoolingaction_tpu import train as train_lib

    path, _ = hmdb_records
    cfg = config_lib.get_config(
        "hmdb51_clip8", backbone="resnet_v1_50", clip_frames=2,
        image_size=64, batch_size=2, eval_batch_size=2, resize_min=64,
        bf16_backbone=False, eval_pattern=path,
        workdir=str(tmp_path / "cmc"))
    state, _, _, _ = train_lib.create_state(cfg)
    res1 = eval_lib.evaluate(cfg, state)
    res = eval_lib.evaluate(
        dataclasses.replace(cfg, eval_clips=2, eval_multicrop=3), state)
    assert res["num_examples"] == 24       # 4 videos x 2 clips x 3 crops
    assert res["num_videos"] == res1["num_videos"] == 4
    assert "per_clip_accuracy" in res
    # resize_min == image_size leaves zero spare extent: every crop is
    # the same pixels, so crop averaging is exact — accuracy must match
    # the single-crop single-clip protocol's per-video decisions
    res_crops_only = eval_lib.evaluate(
        dataclasses.replace(cfg, eval_multicrop=3), state)
    assert res_crops_only["accuracy"] == res1["accuracy"]


def test_clip_iterator_exact_resume(hmdb_records):
    """The clip train iterator checkpoints like any Grain iterator: a
    fresh iterator restored from a JSON-roundtripped state reproduces
    the stream exactly (mid-epoch crash-resume with clip sampling)."""
    import json

    from attentionalpoolingaction_tpu.data import grain_pipeline as gp

    path, spec = hmdb_records
    kw = dict(batch_size=2, image_size=48, resize_min=52, resize_max=56,
              seed=3, clip_frames=3, video_sampling=True)
    it = gp.make_train_iterator(path, spec, **kw)
    for _ in range(2):
        next(it)
    state = json.loads(json.dumps(it.get_state()))
    want = next(it)

    it2 = gp.make_train_iterator(path, spec, **kw)
    it2.set_state(state)
    got = next(it2)
    np.testing.assert_array_equal(want["image"], got["image"])
    np.testing.assert_array_equal(want["frame"], got["frame"])
    np.testing.assert_array_equal(want["video_id"], got["video_id"])


def test_shared_clip_geometry(hmdb_records):
    """All frames of a clip get the SAME crop/flip: preprocessing the
    same encoded frame twice inside one clip yields identical pixels."""
    from attentionalpoolingaction_tpu.data import preprocessing_np as ppnp

    r = np.random.default_rng(0)
    import cv2

    frame = r.integers(0, 255, (60, 70, 3)).astype(np.uint8)
    ok, enc = cv2.imencode(".jpg", frame)
    assert ok
    clip, transform = ppnp.preprocess_clip_np(
        [enc.tobytes()] * 3, out_size=48, is_training=True,
        resize_min=52, resize_max=64, rng=np.random.default_rng(1))
    assert clip.shape == (3, 48, 48, 3)
    np.testing.assert_array_equal(clip[0], clip[1])
    np.testing.assert_array_equal(clip[0], clip[2])
    assert transform.shape == (5,)


# ----------------------------------------------------------- end-to-end


def test_clip_train_and_eval_e2e(hmdb_records, tmp_path):
    import jax.numpy as jnp

    from attentionalpoolingaction_tpu import evaluate as eval_lib
    from attentionalpoolingaction_tpu import train as train_lib

    path, _ = hmdb_records
    cfg = config_lib.get_config(
        "hmdb51_clip8", backbone="resnet_v1_50", clip_frames=2,
        image_size=64, batch_size=2, eval_batch_size=2,
        resize_min=70, resize_max=80, bf16_backbone=False,
        learning_rate=1e-3, freeze_bn=False,
        train_pattern=path, eval_pattern=path,
        workdir=str(tmp_path / "run"))
    state, hist = train_lib.train(cfg, num_steps=2)
    assert np.isfinite(float(hist[-1]["loss/total"]))

    res = eval_lib.evaluate(cfg, state)
    assert res["num_videos"] == 4
    assert res["num_examples"] == 4            # one row per video
    assert 0.0 <= res["accuracy"] <= 1.0


def test_clip_train_on_mesh(hmdb_records, tmp_path):
    """5-D clip batches shard over the data axis like any batch (T folds
    inside the per-device shard) — one SPMD step on the 8-device mesh."""
    from attentionalpoolingaction_tpu import train as train_lib

    path, _ = hmdb_records
    cfg = config_lib.get_config(
        "hmdb51_clip8", backbone="resnet_v1_50", clip_frames=2,
        image_size=64, batch_size=8, resize_min=70, resize_max=80,
        bf16_backbone=False, learning_rate=1e-3, mesh_shape=(8,),
        train_pattern=path, workdir=str(tmp_path / "mesh_run"))
    state, hist = train_lib.train(cfg, num_steps=1)
    assert np.isfinite(float(hist[-1]["loss/total"]))


def test_clip_learning_gate(tmp_path):
    """Clip-mode loss-goes-down: overfit a class-signal synthetic video
    set (the CPU mirror of scripts/tpu_e2e_train.py's learning gate) —
    a wiring bug anywhere in clip sampling -> 5-D batch -> spatiotemporal
    pooling -> softmax CE would stall the loss at ~log(num_classes)."""
    from attentionalpoolingaction_tpu import evaluate as eval_lib
    from attentionalpoolingaction_tpu import train as train_lib

    spec = get_dataset("hmdb51")
    path = str(tmp_path / "sig.tfrecord")
    # 6 videos x 4 frames, labels drawn from 4 separable classes
    rec.write_synthetic_dataset(path, spec, 24, image_size=72, seed=0,
                                frames_per_video=4, class_signal=0.9,
                                num_distinct_classes=4)
    cfg = config_lib.get_config(
        "hmdb51_clip8", backbone="resnet_v1_50", clip_frames=2,
        image_size=64, batch_size=6, eval_batch_size=3,
        resize_min=68, resize_max=72, bf16_backbone=False,
        # freeze_bn (the preset default): 25 steps barely move the
        # 0.997-momentum running stats, so BN-training mode would overfit
        # in train mode yet eval through near-init running stats —
        # frozen BN keeps train and eval normalization identical
        learning_rate=5e-3, freeze_bn=True, lr_schedule="constant",
        train_pattern=path, eval_pattern=path,
        workdir=str(tmp_path / "run"))
    state, hist = train_lib.train(cfg, num_steps=25)
    last = float(hist[-1]["loss/total"])
    assert np.isfinite(last)
    # random-init 51-way CE is ~log(51)=3.93; an overfit run lands well
    # under log(4)=1.39 (hist holds log_every-spaced entries, so assert
    # the absolute level rather than a first-vs-last ratio)
    assert last < 1.5, last
    res = eval_lib.evaluate(cfg, state)
    assert res["accuracy"] >= 0.5, res    # chance on 4 classes = 0.25
    # PTQ on the TRAINED weights must preserve the learned clip behavior
    # on the real protocol (not just logit cosine on random init)
    import dataclasses

    res8 = eval_lib.evaluate(
        dataclasses.replace(cfg, eval_int8=True), state)
    assert res8["accuracy"] >= 0.5, res8


def test_clip_config_guards(hmdb_records, tmp_path):
    from attentionalpoolingaction_tpu import evaluate as eval_lib
    from attentionalpoolingaction_tpu import train as train_lib

    path, spec = hmdb_records
    base = dict(train_pattern=path, eval_pattern=path,
                workdir=str(tmp_path / "g"), backbone="resnet_v1_50",
                bf16_backbone=False, batch_size=2, clip_frames=2)
    # tfdata pipeline cannot do clip sampling
    cfg = config_lib.get_config("hmdb51_clip8", **base,
                                input_pipeline="tfdata")
    with pytest.raises(ValueError, match="grain"):
        train_lib.train(cfg, num_steps=1)
    # non-video dataset cannot do clips
    cfg = config_lib.get_config("mpii_rank1_224", clip_frames=2,
                                input_pipeline="grain",
                                train_pattern=path,
                                workdir=str(tmp_path / "g2"))
    with pytest.raises(ValueError, match="video"):
        train_lib.train(cfg, num_steps=1)
    # eval_clips without clip mode is a loud error, not silently ignored
    cfg = config_lib.get_config("hmdb51_rgb", eval_pattern=path,
                                eval_clips=10)
    with pytest.raises(ValueError, match="eval_clips"):
        eval_lib.make_eval_input(cfg, spec)


def test_clip_eval_int8(hmdb_records, tmp_path):
    """eval_int8 composes with clips: folded_forward folds T into the
    conv batch and pools over T*h*w, matching the live clip protocol."""
    from attentionalpoolingaction_tpu import evaluate as eval_lib
    from attentionalpoolingaction_tpu import train as train_lib

    path, _ = hmdb_records
    cfg = config_lib.get_config(
        "hmdb51_clip8", backbone="resnet_v1_50", clip_frames=2,
        image_size=64, batch_size=2, eval_batch_size=2, resize_min=70,
        bf16_backbone=False, eval_pattern=path, eval_int8=True,
        workdir=str(tmp_path / "i8"))
    state, _, _, _ = train_lib.create_state(cfg)
    res = eval_lib.evaluate(cfg, state)
    assert res["num_videos"] == 4
    assert 0.0 <= res["accuracy"] <= 1.0
