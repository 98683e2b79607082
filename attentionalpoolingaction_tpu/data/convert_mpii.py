"""MPII raw-data -> TFRecord conversion (reference's offline L1 job,
SURVEY.md section 3.3: "raw MPII images + mpii_human_pose .mat ->
per-example proto {jpeg bytes, action id, keypoints} -> sharded TFRecords").

The MPII release annotation (mpii_human_pose_v1_u12_1.mat) stores, per
image: the action/activity id (``act.act_id``, 1..397 minus gaps -> the
~393 used classes), train/test flag, and per-person 16-joint keypoints
(``annolist.annorect.annopoints``).  ``parse_mpii_mat`` flattens that matlab
object graph into plain dicts; ``write_records`` emits the framework schema
(data/records.py).

Usage:
    python -m attentionalpoolingaction_tpu.data.convert_mpii \
        --mat mpii_human_pose_v1_u12_1.mat --images_dir images/ \
        --out_dir records/ --shards 32
"""

from __future__ import annotations

import os

import numpy as np

from attentionalpoolingaction_tpu.data import records as rec
from attentionalpoolingaction_tpu.ops.heatmap import MPII_NUM_JOINTS


def _field(obj, name, default=None):
    try:
        v = getattr(obj, name)
    except AttributeError:
        return default
    return v


def parse_mpii_mat(release) -> list[dict]:
    """Flatten the scipy.io-loaded RELEASE struct (squeeze_me=True,
    struct_as_record=False) into one dict per annotated image:
    {image_name, act_id, is_train, keypoints (K,2) or None, visibility}.
    Multi-person images use the first annotated person (the reference's
    single-frame action task is image-level)."""
    out = []
    annolist = np.atleast_1d(release.annolist)
    acts = np.atleast_1d(release.act)
    is_train = np.atleast_1d(release.img_train)
    for i, anno in enumerate(annolist):
        act_id = int(_field(acts[i], "act_id", -1) or -1)
        name = str(anno.image.name)
        kps = None
        vis = None
        rects = _field(anno, "annorect")
        if rects is not None:
            for rect in np.atleast_1d(rects):
                pts = _field(rect, "annopoints")
                if pts is None or isinstance(pts, np.ndarray) and not pts.size:
                    continue
                point = np.atleast_1d(_field(pts, "point"))
                kps = np.full((MPII_NUM_JOINTS, 2), -1.0, np.float32)
                vis = np.zeros((MPII_NUM_JOINTS,), np.float32)
                for pt in point:
                    j = int(pt.id)
                    if 0 <= j < MPII_NUM_JOINTS:
                        kps[j] = (float(pt.y), float(pt.x))
                        v = _field(pt, "is_visible", 1)
                        try:
                            vis[j] = float(v) if np.size(v) else 1.0
                        except (TypeError, ValueError):
                            vis[j] = 1.0
                break  # first annotated person
        out.append({
            "image_name": name,
            "act_id": act_id,
            "is_train": bool(is_train[i]),
            "keypoints": kps,
            "visibility": vis,
        })
    return out


def assign_split(image_name: str, val_fraction: float) -> str:
    """Deterministic train/val assignment by hashing the image name.

    MPII's public release withholds activity labels on its test images
    (act_id == -1 wherever img_train == 0), so an action-recognition val
    split must be carved out of the *labeled training* images — the
    reference protocol evaluates on such a held-out val split (~6987 of
    ~22k labeled images => default fraction 0.315).  Hashing the filename
    keeps the split stable across conversion runs and machines."""
    import hashlib

    h = int.from_bytes(
        hashlib.md5(image_name.encode()).digest()[:8], "little")
    return "val" if (h % 10_000) < int(val_fraction * 10_000) else "train"


def build_label_map(entries) -> dict[int, int]:
    """MPII act_ids are sparse (1..397 with gaps); map the observed ids to
    dense 0..C-1 labels, sorted for determinism."""
    ids = sorted({e["act_id"] for e in entries if e["act_id"] >= 0})
    return {a: i for i, a in enumerate(ids)}


def write_records(entries, images_dir, out_dir, *, split, label_map,
                  shards=8, writer_cls=rec.ShardedTFRecordWriter):
    """Write one split's entries as sharded TFRecords; returns #examples.
    Entries without an action label are skipped (not part of the task).
    Streams: one example in memory at a time, each written to its
    round-robin shard immediately (VERDICT r2 next #2)."""
    import tensorflow as tf

    with writer_cls(out_dir, split, shards) as w:
        for e in entries:
            if e["act_id"] not in label_map:
                continue
            img_path = os.path.join(images_dir, e["image_name"])
            with open(img_path, "rb") as f:
                jpeg = f.read()
            shape = tf.io.extract_jpeg_shape(jpeg).numpy()
            kps = e["keypoints"]
            w.write(rec.make_example(
                jpeg, height=int(shape[0]), width=int(shape[1]),
                label=label_map[e["act_id"]],
                keypoints=kps if kps is not None else np.full(
                    (MPII_NUM_JOINTS, 2), -1.0, np.float32),
                visibility=e["visibility"] if e["visibility"] is not None
                else np.zeros((MPII_NUM_JOINTS,), np.float32)))
        return w.count


def main(argv=None):
    from absl import app, flags, logging
    del argv

    FLAGS = flags.FLAGS
    import scipy.io

    mat = scipy.io.loadmat(FLAGS.mat, squeeze_me=True,
                           struct_as_record=False)
    entries = parse_mpii_mat(mat["RELEASE"])
    label_map = build_label_map(entries)
    logging.info("%d images, %d action classes", len(entries),
                 len(label_map))
    # Both train and val come from the labeled (img_train == 1) images:
    # the public test set's act_ids are withheld (-1), so it cannot serve
    # as an action-recognition eval split (see assign_split).
    labeled = [e for e in entries if e["is_train"]]
    for split in ("train", "val"):
        split_entries = [
            e for e in labeled
            if assign_split(e["image_name"], FLAGS.val_fraction) == split]
        n = write_records(split_entries, FLAGS.images_dir, FLAGS.out_dir,
                          split=split, label_map=label_map,
                          shards=FLAGS.shards)
        logging.info("%s: wrote %d examples", split, n)


if __name__ == "__main__":
    from absl import app, flags

    flags.DEFINE_string("mat", None, "mpii_human_pose .mat path")
    flags.DEFINE_string("images_dir", None, "MPII images directory")
    flags.DEFINE_string("out_dir", None, "output TFRecord directory")
    flags.DEFINE_integer("shards", 32, "number of output shards per split")
    flags.DEFINE_float("val_fraction", 0.315,
                       "fraction of labeled training images held out as "
                       "the val split (test labels are withheld upstream)")
    flags.mark_flags_as_required(["mat", "images_dir", "out_dir"])
    app.run(main)
