"""Grain input pipeline over the native indexed-TFRecord source.

The Grain path (SURVEY.md section 1 target L1) complements the tf.data
pipeline (data/pipeline.py) with:
  * true global shuffle (random access via native_io's C++ indexed reader,
    not a shuffle buffer);
  * deterministic, checkpointable iteration (grain records its own state);
  * per-host sharding by slicing the global index
    (``ds[process_index::process_count]``).

Example parsing uses tf.train.Example.FromString (pure protobuf, no TF
graph); image preprocessing is the NumPy/cv2 mirror of the VGG transforms
(data/preprocessing_np.py) running in Grain's worker pool.
"""

from __future__ import annotations

import numpy as np

from attentionalpoolingaction_tpu.data import preprocessing_np as ppnp
from attentionalpoolingaction_tpu.data.datasets import DatasetSpec
from attentionalpoolingaction_tpu.data.native_io import make_source


def parse_example(raw: bytes, spec: DatasetSpec, *,
                  include_anno: bool = False) -> dict:
    """Parse a serialized tf.train.Example into numpy features (pure
    protobuf — usable in Grain workers without a TF graph)."""
    import tensorflow as tf

    ex = tf.train.Example.FromString(raw)
    feats = ex.features.feature
    out = {"image_bytes": feats["image/encoded"].bytes_list.value[0]}
    if spec.multi_label:
        out["label"] = np.asarray(
            feats["image/class/multi_hot"].int64_list.value, np.float32)
        if include_anno:
            # raw {+1,-1,0} vector for Known-Object eval; all-zero when
            # the record predates the anno field (KO then disabled)
            anno = np.asarray(
                feats["image/class/anno"].int64_list.value, np.int32)
            out["anno"] = (anno if anno.size == spec.num_classes
                           else np.zeros(spec.num_classes, np.int32))
    else:
        out["label"] = np.int32(
            feats["image/class/label"].int64_list.value[0])
    if spec.has_pose:
        kps = np.asarray(feats["image/pose/keypoints"].float_list.value,
                         np.float32).reshape(spec.num_joints, 2)
        out["keypoints"] = kps
        out["visibility"] = np.asarray(
            feats["image/pose/visibility"].float_list.value, np.float32)
    if spec.is_video:
        out["video_id"] = np.int32(feats["video/id"].int64_list.value[0])
        fr = feats["video/frame"].int64_list.value
        out["frame"] = np.int32(fr[0] if fr else 0)
    return out


def _to_features(parsed: dict, rng, spec: DatasetSpec, *, image_size,
                 is_training, resize_min, resize_max,
                 transfer_uint8=False):
    image, transform = ppnp.preprocess_image_np(
        parsed.pop("image_bytes"), out_size=image_size,
        is_training=is_training, resize_min=resize_min,
        resize_max=resize_max, rng=rng, keep_uint8=transfer_uint8)
    return {"image": image, "transform": transform, **parsed}


def make_train_dataset(pattern, spec: DatasetSpec, *, batch_size: int,
                       image_size: int, resize_min: int | None = None,
                       resize_max: int | None = None, seed: int = 0,
                       shard_index: int = 0, shard_count: int = 1,
                       transfer_uint8: bool = False):
    """Infinite shuffled Grain MapDataset of batched feature dicts
    (per-host batch).  Iterate with iter(ds) or ds.to_iter_dataset()."""
    import grain

    resize_min = resize_min or image_size
    resize_max = resize_max or int(resize_min * 512 / 256)
    src = make_source(pattern)
    ds = grain.MapDataset.source(src).seed(seed)
    if shard_count > 1:
        ds = ds.slice(slice(shard_index, None, shard_count))
    ds = ds.shuffle().repeat()
    ds = ds.random_map(
        lambda raw, rng: _to_features(
            parse_example(raw, spec), rng, spec, image_size=image_size,
            is_training=True, resize_min=resize_min, resize_max=resize_max,
            transfer_uint8=transfer_uint8))
    ds = ds.batch(batch_size, drop_remainder=True,
                  batch_fn=_stack_features)
    return ds


def _record_video_ids(read_record, n: int) -> list[int]:
    """video/id of each of ``n`` records (full proto parse — used once per
    file, then cached in the .vidx sidecar)."""
    import tensorflow as tf

    return [
        int(tf.train.Example.FromString(read_record(i))
            .features.feature["video/id"].int64_list.value[0])
        for i in range(n)
    ]


def _file_video_ids(f) -> list[int]:
    """Per-record video ids of one indexed TFRecord file, cached in a
    ``<file>.vidx.json`` sidecar keyed by (size, mtime) — so training
    start and crash-resume don't re-parse every frame's multi-KB JPEG
    proto just to read an int (HMDB at 25 frames/video is ~GBs)."""
    import json
    import os
    import pathlib

    sidecar = pathlib.Path(f.tfrecord_path + ".vidx.json")
    st = os.stat(f.tfrecord_path)
    # mtime at ns resolution: a same-size rewrite within the same SECOND
    # would pass a coarse (size, mtime_s) key and serve stale video ids
    key = [int(st.st_size), int(st.st_mtime_ns)]
    if sidecar.exists():
        try:
            cached = json.loads(sidecar.read_text())
            if cached.get("key") == key:
                return cached["video_ids"]
        except (ValueError, KeyError, OSError):
            pass
    ids = _record_video_ids(lambda i: f[i], len(f))
    try:
        sidecar.write_text(json.dumps({"key": key, "video_ids": ids}))
    except OSError:
        pass  # read-only dataset dir: rebuild in memory each start
    return ids


def build_video_index(src, spec: DatasetSpec) -> dict[int, list[int]]:
    """Group record indices by video id (one scan over the source,
    sidecar-cached per file).

    HMDB records are per-frame (convert_hmdb stores up to frames_per_video
    frames per video); training-time temporal sampling draws a random
    frame per video per epoch, so the index must know which records belong
    to which video (SURVEY.md section 1 L2 "HMDB adds frame sampling")."""
    del spec  # schema is fixed: video/id int64
    by_vid: dict[int, list[int]] = {}
    i = 0
    for f in getattr(src, "files", None) or []:
        for vid in _file_video_ids(f):
            by_vid.setdefault(vid, []).append(i)
            i += 1
    if i == 0:  # non-indexed source: direct scan
        for vid in _record_video_ids(lambda j: src[j], len(src)):
            by_vid.setdefault(vid, []).append(i)
            i += 1
    return by_vid


def _segment_picks(n: int, clip_frames: int, rng=None,
                   frac: float = 0.5) -> list[int]:
    """TSN-style temporal sampling: split ``n`` frames into ``clip_frames``
    equal segments and pick one frame per segment — a random one with an
    ``rng`` (training), the frame at fraction ``frac`` of the segment
    without one (eval; 0.5 = segment center, other fractions give the
    deterministic jittered clips of multi-clip eval).  Videos shorter
    than ``clip_frames`` repeat frames (linspace over segments), keeping
    the clip shape static for XLA."""
    bounds = np.linspace(0, n, clip_frames + 1)
    picks = []
    for i in range(clip_frames):
        lo, hi = int(bounds[i]), max(int(bounds[i + 1]), int(bounds[i]) + 1)
        hi = min(hi, n)
        if hi <= lo:
            lo = hi - 1
        picks.append(int(rng.integers(lo, hi)) if rng is not None
                     else min(lo + int(frac * (hi - lo)), hi - 1))
    return picks


def _clip_features(raws, rng, spec: DatasetSpec, *, image_size,
                   is_training, resize_min, resize_max,
                   transfer_uint8=False, crop_frac=None):
    """Parse ``clip_frames`` raw records of ONE video into a stacked
    (T, H, W, 3) clip with a single shared geometric transform; label and
    video_id come from the first frame (identical across a video)."""
    parsed = [parse_example(r, spec) for r in raws]
    clip, transform = ppnp.preprocess_clip_np(
        [p["image_bytes"] for p in parsed], out_size=image_size,
        is_training=is_training, resize_min=resize_min,
        resize_max=resize_max, rng=rng, keep_uint8=transfer_uint8,
        crop_frac=crop_frac)
    first = parsed[0]
    return {"image": clip, "transform": transform,
            "label": first["label"], "video_id": first["video_id"],
            "frame": np.asarray([p["frame"] for p in parsed], np.int32)}


def make_video_train_dataset(pattern, spec: DatasetSpec, *,
                             batch_size: int, image_size: int,
                             resize_min: int | None = None,
                             resize_max: int | None = None, seed: int = 0,
                             shard_index: int = 0, shard_count: int = 1,
                             transfer_uint8: bool = False,
                             clip_frames: int = 1):
    """Video-level train dataset with per-epoch temporal frame sampling.

    The Grain index is the set of VIDEOS (not frames): each epoch visits
    every video once in a fresh shuffle and draws frames from its stored
    records — so frame selection varies across epochs (the reference-era
    HMDB training protocol), unlike iterating pre-extracted frames
    directly.  ``clip_frames == 1`` (the reference protocol) yields one
    random frame per video; ``clip_frames > 1`` yields a temporally
    ordered (T, H, W, 3) clip — one random frame from each of T equal
    segments (TSN-style), all frames sharing one geometric augmentation —
    for the clip-level spatiotemporal pooling mode (ActionModel accepts
    the 5-D batch directly).  Eval keeps deterministic sampling
    (convert_hmdb.sample_frame_indices / segment centers)."""
    import grain

    resize_min = resize_min or image_size
    resize_max = resize_max or int(resize_min * 512 / 256)
    src = make_source(pattern)
    by_vid = build_video_index(src, spec)
    frame_lists = [by_vid[v] for v in sorted(by_vid)]

    ds = grain.MapDataset.source(frame_lists).seed(seed)
    if shard_count > 1:
        ds = ds.slice(slice(shard_index, None, shard_count))
    ds = ds.shuffle().repeat()

    def sample(frame_idxs, rng):
        if clip_frames > 1:
            picks = _segment_picks(len(frame_idxs), clip_frames, rng)
            return _clip_features(
                [src[frame_idxs[p]] for p in picks], rng, spec,
                image_size=image_size, is_training=True,
                resize_min=resize_min, resize_max=resize_max,
                transfer_uint8=transfer_uint8)
        raw = src[frame_idxs[rng.integers(len(frame_idxs))]]
        return _to_features(
            parse_example(raw, spec), rng, spec, image_size=image_size,
            is_training=True, resize_min=resize_min, resize_max=resize_max,
            transfer_uint8=transfer_uint8)

    ds = ds.random_map(sample)
    ds = ds.batch(batch_size, drop_remainder=True,
                  batch_fn=_stack_features)
    return ds


def make_video_clip_eval_dataset(pattern, spec: DatasetSpec, *,
                                 batch_size: int, image_size: int,
                                 resize_min: int | None = None,
                                 clip_frames: int = 8,
                                 num_clips: int = 1,
                                 num_crops: int = 1,
                                 pad_to_batch: bool = True,
                                 shard_index: int = 0,
                                 shard_count: int = 1):
    """``num_clips`` deterministic (clip_frames, H, W, 3) clips per VIDEO
    (clip k picks the frame at fraction (k+0.5)/num_clips of each
    temporal segment; central crop).  With one clip each row's logits are
    already video-level; with several, the rows share the video_id and
    the standard eval flow's per-video averaging combines them (the
    classic multi-clip video protocol — the temporal analog of multicrop,
    and it shards the same way: clips of one video may land on different
    processes, averaging happens after the gather).

    ``num_crops > 1`` adds the SPATIAL multi-crop axis (the classic
    "K clips x N crops" video protocol): each clip additionally yields
    ``num_crops`` rows, crop j sharing one geometric placement across
    all frames at fraction j/(num_crops-1) of the spare extent — the
    same diagonal crops as eval_multicrop_np — and the identical
    video_id folds crops into the same per-video averaging.  Rows per
    video = num_clips * num_crops."""
    import grain

    resize_min = resize_min or image_size
    src = make_source(pattern)
    by_vid = build_video_index(src, spec)
    num_crops = max(num_crops, 1)
    rows = [(by_vid[v], k, j) for v in sorted(by_vid)
            for k in range(num_clips) for j in range(num_crops)]

    ds = grain.MapDataset.source(rows).seed(0)
    if shard_count > 1:
        ds = ds.slice(slice(shard_index, None, shard_count))

    def to_features(row):
        frame_idxs, k, j = row
        picks = _segment_picks(len(frame_idxs), clip_frames,
                               frac=(k + 0.5) / num_clips)
        feats = _clip_features(
            [src[frame_idxs[p]] for p in picks], None, spec,
            image_size=image_size, is_training=False,
            resize_min=resize_min, resize_max=None,
            crop_frac=None if num_crops == 1 else j / (num_crops - 1))
        return {**feats, "mask": np.float32(1.0)}

    ds = ds.map(to_features)
    ds = ds.batch(batch_size, drop_remainder=False,
                  batch_fn=_stack_features)
    if pad_to_batch:
        ds = ds.map(lambda b: _pad_batch(b, batch_size))
    return ds


def make_eval_dataset(pattern, spec: DatasetSpec, *, batch_size: int,
                      image_size: int, resize_min: int | None = None,
                      pad_to_batch: bool = True, shard_index: int = 0,
                      shard_count: int = 1):
    """One-pass deterministic eval dataset with final-batch padding.
    ``shard_count > 1`` slices the split per process (multi-host sharded
    eval — each host reads a disjoint 1/shard_count of the examples)."""
    import grain

    resize_min = resize_min or image_size
    src = make_source(pattern)
    ds = grain.MapDataset.source(src).seed(0)
    if shard_count > 1:
        ds = ds.slice(slice(shard_index, None, shard_count))
    ds = ds.map(
        lambda raw: _to_features(
            parse_example(raw, spec, include_anno=spec.multi_label), None,
            spec, image_size=image_size,
            is_training=False, resize_min=resize_min, resize_max=None))
    ds = ds.map(lambda d: {**d, "mask": np.float32(1.0)})
    ds = ds.batch(batch_size, drop_remainder=False,
                  batch_fn=_stack_features)
    if pad_to_batch:
        ds = ds.map(lambda b: _pad_batch(b, batch_size))
    return ds


def make_multicrop_eval_dataset(pattern, spec: DatasetSpec, *,
                                batch_size: int, image_size: int,
                                resize_min: int, num_crops: int = 3,
                                pad_to_batch: bool = True,
                                shard_index: int = 0,
                                shard_count: int = 1):
    """Grain mirror of pipeline.make_multicrop_eval_iterator: each example
    becomes (num_crops, H, W, 3); crops average in the eval step (and
    shard across the mesh — evaluate.make_multicrop_eval_step)."""
    import grain

    src = make_source(pattern)
    ds = grain.MapDataset.source(src).seed(0)
    if shard_count > 1:
        ds = ds.slice(slice(shard_index, None, shard_count))

    def to_features(raw):
        parsed = parse_example(raw, spec,
                               include_anno=spec.multi_label)
        crops = ppnp.eval_multicrop_np(
            parsed.pop("image_bytes"), out_size=image_size,
            resize_min=resize_min, num_crops=num_crops)
        return {"image": crops, "mask": np.float32(1.0), **parsed}

    ds = ds.map(to_features)
    ds = ds.batch(batch_size, drop_remainder=False,
                  batch_fn=_stack_features)
    if pad_to_batch:
        ds = ds.map(lambda b: _pad_batch(b, batch_size))
    return ds


def _stack_features(elems):
    out = {}
    for k in elems[0]:
        out[k] = np.stack([np.asarray(e[k]) for e in elems])
    return out


def _pad_batch(batch, batch_size):
    n = len(next(iter(batch.values())))
    if n == batch_size:
        return batch
    out = {}
    for k, v in batch.items():
        pad = [(0, batch_size - n)] + [(0, 0)] * (v.ndim - 1)
        out[k] = np.pad(v, pad)
    return out


def make_train_iterator(pattern, spec: DatasetSpec, *, num_workers: int = 0,
                        read_buffer: int = 2, video_sampling: bool = False,
                        **kw):
    """Iterator over train batches with optional multiprocess prefetch
    (Grain worker pool — the host-overlap path).  ``video_sampling``
    switches to the video-indexed dataset with per-epoch random frame
    selection (HMDB training protocol)."""
    import grain

    maker = make_video_train_dataset if video_sampling else (
        make_train_dataset)
    ds = maker(pattern, spec, **kw)
    it_ds = ds.to_iter_dataset()
    if num_workers:
        it_ds = it_ds.mp_prefetch(
            grain.multiprocessing.MultiprocessingOptions(
                num_workers=num_workers))
    return iter(it_ds)
