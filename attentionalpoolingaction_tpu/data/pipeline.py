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
    keeps one frame per video.  ``frames_per_video`` MUST match the
    converter's --frames_per_video: it is the window size, and a
    full-length video's window flushes the moment its frames have
    streamed past.  Windows of SHORT videos (converter stored fewer
    frames than requested) stay buffered until end-of-input — selection
    is still correct (they flush then), it just costs their JPEG bytes in
    host RAM for the epoch; an oversized window_size would do that for
    EVERY video.  Reading frames_per_video x the consumed bytes per epoch
    is acceptable at HMDB51 scale; prefer Grain for bigger corpora.

    Determinism (VERDICT r3 next #8): frame draws and the per-epoch video
    visit order are STATELESS, keyed on (seed, epoch, video_id) — the
    stream is reproducible across runs with the same seed (matching the
    Grain path's guarantee) while still redrawing a fresh frame and a
    fresh order every epoch.  Epochs come from an outer
    ``range().flat_map`` instead of ``repeat()`` so the epoch index is
    available to the keying.

    Multi-host sharding is by VIDEO id (not record round-robin) so each
    video lives on exactly one host — the grain path's semantics."""
    import tensorflow as tf

    resize_min = resize_min or image_size
    resize_max = resize_max or int(resize_min * 512 / 256)
    base = _base_dataset(file_pattern, spec, shuffle=False, seed=seed,
                         shard_by_process=False)
    if shard_by_process and jax.process_count() > 1:
        n = jax.process_count()
        i = jax.process_index()
        base = base.filter(lambda p: p["video/id"] % n == i)
    seed64 = tf.constant(seed, tf.int64)

    def one_epoch(epoch):
        def reduce_fn(key, win):
            def pick(batch):
                # one stateless draw per (seed, epoch, video): batch holds
                # ALL of this video's stored frames (window == converter's
                # frames_per_video; short videos flush smaller at EOI)
                n_frames = tf.shape(
                    tf.reshape(batch["video/id"], [-1]))[0]
                draw_seed = tf.stack([seed64 * 2654435761 + epoch, key])
                idx = tf.random.stateless_uniform(
                    [], seed=draw_seed, minval=0,
                    maxval=tf.cast(n_frames, tf.int64), dtype=tf.int64)
                return {k: v[idx] for k, v in batch.items()}

            return win.batch(frames_per_video).map(pick)

        ds_e = base.group_by_window(
            key_func=lambda p: p["video/id"],
            reduce_func=reduce_fn, window_size=frames_per_video)
        # visit order: deterministic fresh shuffle per epoch (seed keyed
        # on epoch; reshuffle irrelevant — each epoch is a new dataset)
        return ds_e.shuffle(2048, seed=seed64 * 100003 + epoch,
                            reshuffle_each_iteration=False)

    ds = tf.data.Dataset.range(1 << 30).flat_map(one_epoch)
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


class StatefulPrefetchIterator:
    """H2D-overlapping prefetch for STATEFUL (checkpointable) iterators
    without losing exact mid-epoch resume (VERDICT r3 missing #3 / next
    #2).

    ``prefetch_to_device`` cannot wrap a Grain/CheckpointableTfIterator
    directly: it runs the inner iterator ``size`` batches ahead, so at
    checkpoint time ``get_state()`` would describe a position the train
    loop has not reached — a restore would SKIP the in-flight batches.
    This wrapper snapshots the inner state immediately after pulling each
    batch and buffers ``(state, device_batch)`` pairs: ``get_state()``
    returns the snapshot paired with the last *consumed* batch, so
    checkpointed state always matches exactly what the train loop saw,
    while the H2D copy (async ``device_put``) of the next batch overlaps
    the current device step.

    Cost note: one inner ``get_state()`` per batch.  Grain's is a small
    dict (microseconds); CheckpointableTfIterator's serializes a TF
    checkpoint (~ms) — acceptable, and that path is opt-in
    (``tfdata_checkpoint``); Grain is the recommended long-run pipeline.

    ``sharding``/multi-process placement mirrors ``prefetch_to_device``:
    single-process device_put onto the (mesh) sharding, multi-process
    global-array assembly from per-host shards.
    """

    def __init__(self, iterator, size: int = 2, sharding=None):
        self._it = iterator
        self._size = max(1, int(size))
        self._sharding = sharding
        self._queue = collections.deque()   # (state_after_batch, batch)
        # state corresponding to "everything consumed so far" — before the
        # first __next__ that is the inner iterator's CURRENT position
        # (post-restore position when train() just called set_state)
        self._consumed_state = iterator.get_state()
        self._exhausted = False
        self._multiprocess = jax.process_count() > 1

    def _put(self, batch):
        if self._sharding is not None:
            if self._multiprocess:
                return jax.tree.map(
                    lambda x: jax.make_array_from_process_local_data(
                        self._sharding, np.asarray(x)), batch)
            return jax.tree.map(
                lambda x: jax.device_put(x, self._sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    def _fill(self):
        while not self._exhausted and len(self._queue) < self._size:
            try:
                batch = next(self._it)
            except StopIteration:
                self._exhausted = True
                return
            # snapshot BEFORE the next pull: this state means "batch and
            # everything before it consumed" — exactly what a resume
            # after consuming ``batch`` must restore
            self._queue.append((self._it.get_state(), self._put(batch)))

    def __iter__(self):
        return self

    def __next__(self):
        self._fill()
        if not self._queue:
            raise StopIteration
        state, batch = self._queue.popleft()
        self._consumed_state = state
        return batch

    def get_state(self):
        return self._consumed_state

    def set_state(self, state):
        self._queue.clear()
        self._exhausted = False
        self._it.set_state(state)
        self._consumed_state = state


class EchoIterator:
    """Batch-level data echoing (Choi et al. 2019, "Faster Neural Network
    Training with Data Echoing"): yield each upstream batch ``echo``
    consecutive times, so an input-bound host feeds ``echo`` optimizer
    steps per pipeline batch.  Opt-in via ``TrainConfig.data_echo`` — it
    changes training semantics (consecutive steps see the same examples),
    the classic trade when the input pipeline or the H2D link, not the
    chip, is the bottleneck.

    Sits ABOVE the device-prefetch wrapper, so echoed repeats reuse the
    same on-device batch: zero extra host work and zero extra H2D.

    Exact resume: if the inner iterator is stateful (get_state/set_state),
    this wrapper is too.  State = {inner state BEFORE the current batch
    was pulled, echo phase}.  Restoring with phase > 0 re-pulls one batch
    from the restored inner state — deterministic pipelines (Grain; the
    stateless-keyed tf.data samplers) reproduce the in-flight batch
    exactly, so mid-echo checkpoints (SIGTERM at an arbitrary step) lose
    nothing."""

    def __init__(self, iterator, echo: int):
        if echo < 1:
            raise ValueError(f"echo must be >= 1, got {echo}")
        self._it = iterator
        self._echo = int(echo)
        self._stateful = hasattr(iterator, "get_state")
        self._inner_before = (iterator.get_state() if self._stateful
                              else None)
        self._batch = None
        self._phase = 0          # echoes of the current batch already out

    def __iter__(self):
        return self

    def __next__(self):
        if self._phase == 0:
            if self._stateful:
                self._inner_before = self._it.get_state()
            self._batch = next(self._it)   # StopIteration propagates
        self._phase = (self._phase + 1) % self._echo
        return self._batch

    def get_state(self):
        if not self._stateful:
            raise AttributeError("inner iterator is not checkpointable")
        if self._phase == 0:
            # cycle boundary: the last batch is FULLY consumed — state is
            # the inner's live position (inner_before would replay it)
            return {"inner_before": self._it.get_state(), "phase": 0}
        return {"inner_before": self._inner_before, "phase": self._phase}

    def set_state(self, state):
        self._it.set_state(state["inner_before"])
        # keep the pre-batch snapshot: a checkpoint taken mid-echo AFTER
        # this restore (before the next batch boundary) must re-save the
        # same inner_before, not the construction-time state
        self._inner_before = state["inner_before"]
        self._phase = int(state["phase"])
        # phase > 0: an echoed batch was in flight — re-pull it from the
        # restored position (deterministic pipeline => identical batch)
        self._batch = next(self._it) if self._phase else None


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
