"""Input pipelines: tf.data TFRecord readers feeding numpy batches to the
jit'd step, with per-host sharding over a JAX mesh.

Replaces the reference's TF1 queue-runner path (SURVEY.md section 3.1 steps
2-4).  Decode/augment runs on host CPU threads inside tf.data's C++ runtime;
``prefetch_to_device`` overlaps host batch prep + H2D transfer with the
device step so the TPU never waits on input (SURVEY.md section 7 step 8).

Per-host sharding: each JAX process reads a disjoint shard of the record
files/examples (``shard(num_processes, process_index)``), the standard
multi-host JAX data-parallel recipe.
"""

from __future__ import annotations

import collections
from typing import Iterator

import jax
import numpy as np

from attentionalpoolingaction_tpu.data import records as rec
from attentionalpoolingaction_tpu.data import preprocessing as pp
from attentionalpoolingaction_tpu.data.datasets import DatasetSpec


def _base_dataset(file_pattern, spec: DatasetSpec, *, shuffle: bool,
                  seed: int, shard_by_process: bool):
    import tensorflow as tf

    files = tf.data.Dataset.list_files(file_pattern, shuffle=False)
    ds = tf.data.TFRecordDataset(files, num_parallel_reads=tf.data.AUTOTUNE)
    if shard_by_process and jax.process_count() > 1:
        ds = ds.shard(jax.process_count(), jax.process_index())
    if shuffle:
        ds = ds.shuffle(4096, seed=seed, reshuffle_each_iteration=True)
    desc = rec.feature_description(spec)
    return ds.map(lambda x: tf.io.parse_single_example(x, desc),
                  num_parallel_calls=tf.data.AUTOTUNE)


def _to_features(parsed, spec: DatasetSpec, *, image_size, is_training,
                 resize_min, resize_max, transfer_uint8=False):
    """Map a parsed example to the model's feature dict (TF ops)."""
    import tensorflow as tf

    image, transform = pp.preprocess_image_tf(
        parsed["image/encoded"], out_size=image_size,
        is_training=is_training, resize_min=resize_min,
        resize_max=resize_max, keep_uint8=transfer_uint8)
    out = {"image": image, "transform": transform}
    if spec.multi_label:
        out["label"] = tf.cast(parsed["image/class/multi_hot"], tf.float32)
        if not is_training:
            # raw {+1,-1,0} annotation for Known-Object eval masking
            out["anno"] = tf.cast(parsed["image/class/anno"], tf.int32)
    else:
        out["label"] = tf.cast(parsed["image/class/label"], tf.int32)
    if spec.has_pose:
        out["keypoints"] = tf.reshape(
            parsed["image/pose/keypoints"], [spec.num_joints, 2])
        out["visibility"] = parsed["image/pose/visibility"]
    if spec.is_video:
        out["video_id"] = tf.cast(parsed["video/id"], tf.int32)
        out["frame"] = tf.cast(parsed["video/frame"], tf.int32)
    return out


class CheckpointableTfIterator:
    """tf.data train iterator exposing Grain's ``get_state``/``set_state``
    protocol, so ``train()`` checkpoints the exact stream position beside
    the model and a restart resumes mid-epoch (SURVEY.md section 5
    checkpoint/resume row — closes the "tf.data restarts mid-epoch" gap).

    Uses tf.data *symbolic* checkpointing: the state records seeds and
    input offsets rather than shuffle-buffer/prefetch contents, so it stays
    a few KB.  The serialized TF checkpoint files are base64-embedded in
    the returned dict to fit the JSON state-file protocol.

    Scope: the example ORDER (shuffle position, epoch offset) resumes
    exactly; stateful per-image augmentation RNG (random crop/flip) is not
    part of symbolic state (TF logs "RandomUniformInt is stateful"), so a
    resumed run sees the same examples with fresh augmentation draws —
    the property that matters for loss-curve continuity."""

    def __init__(self, ds):
        import tensorflow as tf

        self._it = iter(ds)
        self._ckpt = tf.train.Checkpoint(iterator=self._it)

    def __iter__(self):
        return self

    def __next__(self):
        el = next(self._it)
        return {k: v.numpy() for k, v in el.items()}

    def get_state(self) -> dict:
        import base64
        import os
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            self._ckpt.write(os.path.join(d, "it"))
            files = {}
            for name in sorted(os.listdir(d)):
                with open(os.path.join(d, name), "rb") as f:
                    files[name] = base64.b64encode(f.read()).decode("ascii")
        return {"tfdata_ckpt": files}

    def set_state(self, state: dict) -> None:
        import base64
        import os
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            for name, b64 in state["tfdata_ckpt"].items():
                with open(os.path.join(d, name), "wb") as f:
                    f.write(base64.b64decode(b64))
            self._ckpt.read(os.path.join(d, "it")).assert_consumed()


def make_train_iterator(file_pattern, spec: DatasetSpec, *,
                        batch_size: int, image_size: int,
                        resize_min: int | None = None,
                        resize_max: int | None = None,
                        seed: int = 0,
                        shard_by_process: bool = True,
                        transfer_uint8: bool = False,
                        checkpointable: bool = False) -> Iterator[dict]:
    """Infinite shuffled train iterator of numpy batches (per-host batch).

    ``transfer_uint8`` ships images as uint8 (4x less host->device traffic;
    the jit'd step normalizes on device — train.normalize_images).
    ``checkpointable`` returns a ``CheckpointableTfIterator`` whose stream
    position can be saved/restored with the model checkpoint."""
    import tensorflow as tf

    resize_min = resize_min or image_size
    resize_max = resize_max or int(resize_min * 512 / 256)
    ds = _base_dataset(file_pattern, spec, shuffle=True, seed=seed,
                       shard_by_process=shard_by_process)
    ds = ds.repeat()
    ds = ds.map(
        lambda p: _to_features(p, spec, image_size=image_size,
                               is_training=True, resize_min=resize_min,
                               resize_max=resize_max,
                               transfer_uint8=transfer_uint8),
        num_parallel_calls=tf.data.AUTOTUNE)
    ds = ds.batch(batch_size, drop_remainder=True)
    ds = ds.prefetch(tf.data.AUTOTUNE)
    if checkpointable:
        opts = tf.data.Options()
        opts.experimental_symbolic_checkpoint = True
        return CheckpointableTfIterator(ds.with_options(opts))
    return ds.as_numpy_iterator()


def make_video_train_iterator(file_pattern, spec: DatasetSpec, *,
                              batch_size: int, image_size: int,
                              resize_min: int | None = None,
                              resize_max: int | None = None,
                              seed: int = 0,
                              shard_by_process: bool = True,
                              transfer_uint8: bool = False,
                              frames_per_video: int = 25
                              ) -> Iterator[dict]:
    """Per-epoch random-frame-per-video training iterator (tf.data).

    Protocol parity with grain_pipeline.make_video_train_dataset (the
    reference-era HMDB recipe — SURVEY.md section 1 L2 "HMDB adds frame
    sampling"): every epoch visits each video once in a fresh shuffle and
    draws ONE random frame from its stored frames, so frame selection
    varies across epochs.

    Mechanics: TFRecords are sequential (random access lives in the Grain
    path), so each epoch READS all stored frames and `group_by_window`
    keeps one random frame per video (the in-window `shuffle().take(1)`
    redraws every epoch).  ``frames_per_video`` MUST match the converter's
    --frames_per_video: it is the window size, and a full-length video's
    window flushes the moment its frames have streamed past.  Windows of
    SHORT videos (converter stored fewer frames than requested) stay
    buffered until end-of-input — selection is still correct (they flush
    then), it just costs their JPEG bytes in host RAM for the epoch; an
    oversized window_size would do that for EVERY video.  Reading
    frames_per_video x the consumed bytes per epoch is acceptable at
    HMDB51 scale; prefer Grain for bigger corpora.  Frame draws use TF's
    stateful RNG: fresh each epoch, not reproducible across runs
    (Grain's seeded path is).

    Multi-host sharding is by VIDEO id (not record round-robin) so each
    video lives on exactly one host — the grain path's semantics."""
    import tensorflow as tf

    resize_min = resize_min or image_size
    resize_max = resize_max or int(resize_min * 512 / 256)
    ds = _base_dataset(file_pattern, spec, shuffle=False, seed=seed,
                       shard_by_process=False)
    if shard_by_process and jax.process_count() > 1:
        n = jax.process_count()
        i = jax.process_index()
        ds = ds.filter(lambda p: p["video/id"] % n == i)
    ds = ds.group_by_window(
        key_func=lambda p: p["video/id"],
        reduce_func=lambda key, win: win.shuffle(
            frames_per_video).take(1),
        window_size=frames_per_video)
    # video visit order: fresh shuffle each epoch (reshuffle default)
    ds = ds.shuffle(2048, seed=seed)
    ds = ds.repeat()
    ds = ds.map(
        lambda p: _to_features(p, spec, image_size=image_size,
                               is_training=True, resize_min=resize_min,
                               resize_max=resize_max,
                               transfer_uint8=transfer_uint8),
        num_parallel_calls=tf.data.AUTOTUNE)
    ds = ds.batch(batch_size, drop_remainder=True)
    ds = ds.prefetch(tf.data.AUTOTUNE)
    return ds.as_numpy_iterator()


def make_eval_iterator(file_pattern, spec: DatasetSpec, *,
                       batch_size: int, image_size: int,
                       resize_min: int | None = None,
                       pad_to_batch: bool = True,
                       shard_by_process: bool = False,
                       transfer_uint8: bool = False) -> Iterator[dict]:
    """One-pass eval iterator.  Pads the final short batch (with a ``mask``
    key) so shapes stay static for jit."""
    import tensorflow as tf

    resize_min = resize_min or image_size
    ds = _base_dataset(file_pattern, spec, shuffle=False, seed=0,
                       shard_by_process=shard_by_process)
    ds = ds.map(
        lambda p: _to_features(p, spec, image_size=image_size,
                               is_training=False, resize_min=resize_min,
                               resize_max=None,
                               transfer_uint8=transfer_uint8),
        num_parallel_calls=tf.data.AUTOTUNE)
    ds = ds.batch(batch_size, drop_remainder=False)
    ds = ds.prefetch(tf.data.AUTOTUNE)

    def gen():
        for batch in ds.as_numpy_iterator():
            n = batch["image"].shape[0]
            batch["mask"] = np.ones((n,), np.float32)
            if pad_to_batch and n < batch_size:
                padded = {}
                for k, v in batch.items():
                    pad = [(0, batch_size - n)] + [(0, 0)] * (v.ndim - 1)
                    padded[k] = np.pad(v, pad)
                batch = padded
            yield batch

    return gen()


def make_multicrop_eval_iterator(file_pattern, spec: DatasetSpec, *,
                                 batch_size: int, image_size: int,
                                 resize_min: int, num_crops: int = 3,
                                 pad_to_batch: bool = True,
                                 shard_by_process: bool = False):
    """High-res multi-crop eval (BASELINE.json config #5): each example
    becomes (num_crops, H, W, 3); evaluate.make_multicrop_eval_step
    averages logits over the crop dim (crops shard across the mesh)."""
    import tensorflow as tf

    ds = _base_dataset(file_pattern, spec, shuffle=False, seed=0,
                       shard_by_process=shard_by_process)

    def to_features(parsed):
        crops = pp.eval_multicrop_tf(
            parsed["image/encoded"], out_size=image_size,
            resize_min=resize_min, num_crops=num_crops)
        out = {"image": crops}
        if spec.multi_label:
            out["label"] = tf.cast(parsed["image/class/multi_hot"],
                                   tf.float32)
            out["anno"] = tf.cast(parsed["image/class/anno"], tf.int32)
        else:
            out["label"] = tf.cast(parsed["image/class/label"], tf.int32)
        if spec.is_video:
            out["video_id"] = tf.cast(parsed["video/id"], tf.int32)
        return out

    ds = ds.map(to_features, num_parallel_calls=tf.data.AUTOTUNE)
    ds = ds.batch(batch_size, drop_remainder=False)
    ds = ds.prefetch(tf.data.AUTOTUNE)

    def gen():
        for batch in ds.as_numpy_iterator():
            n = batch["image"].shape[0]
            batch["mask"] = np.ones((n,), np.float32)
            if pad_to_batch and n < batch_size:
                padded = {}
                for k, v in batch.items():
                    pad = [(0, batch_size - n)] + [(0, 0)] * (v.ndim - 1)
                    padded[k] = np.pad(v, pad)
                batch = padded
            yield batch

    return gen()


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Overlap host batch production + H2D copy with device compute: keep
    ``size`` batches in flight on device (jax.device_put is async).  Pass a
    NamedSharding to place batches across a mesh.

    Single-process: the iterator's batch IS the global batch — device_put
    lays it out over the (local) mesh.  Multi-process: the iterator yields
    this host's 1/process_count share, and the global array is assembled
    from per-process local shards (the mesh spans non-addressable devices,
    where device_put of host data is invalid)."""
    queue = collections.deque()
    multiprocess = jax.process_count() > 1

    def _put(batch):
        if sharding is not None:
            if multiprocess:
                return jax.tree.map(
                    lambda x: jax.make_array_from_process_local_data(
                        sharding, np.asarray(x)), batch)
            return jax.tree.map(
                lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    for batch in iterator:
        queue.append(_put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
