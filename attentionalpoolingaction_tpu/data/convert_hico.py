"""HICO raw-data -> TFRecord conversion (SURVEY.md section 3.3: "Same
pattern for HICO (600 multi-hot labels)").

HICO's anno.mat carries ``list_train``/``list_test`` (filenames) and
``anno_train``/``anno_test`` (600 x N matrices with +1 positive, -1
negative, 0/NaN unknown).  The multi-hot training target treats unknown
entries as negative (default protocol); the raw {+1,-1,0} vector is also
stored (``image/class/anno``) so eval can run the "Known Object" protocol
(unknown pairs excluded per class — ops/metrics.py
mean_average_precision_known).

Usage:
    python -m attentionalpoolingaction_tpu.data.convert_hico \
        --mat anno.mat --images_dir hico/images --out_dir records/
"""

from __future__ import annotations

import os

import numpy as np

from attentionalpoolingaction_tpu.data import records as rec

NUM_HOI_CLASSES = 600


def anno_to_multi_hot(anno_col: np.ndarray) -> np.ndarray:
    """(600,) of {+1,-1,0,NaN} -> multi-hot {0,1} int64."""
    col = np.nan_to_num(np.asarray(anno_col, np.float32), nan=0.0)
    return (col > 0).astype(np.int64)


def anno_to_known(anno_col: np.ndarray) -> np.ndarray:
    """(600,) of {+1,-1,0,NaN} -> {+1,-1,0} int64 (NaN folds to unknown)."""
    col = np.nan_to_num(np.asarray(anno_col, np.float32), nan=0.0)
    return np.sign(col).astype(np.int64)


def write_records(filenames, anno, images_dir, out_dir, *, split,
                  shards=8, writer_cls=rec.ShardedTFRecordWriter):
    """Streams: one image in memory at a time, each example written to its
    round-robin shard immediately (VERDICT r2 next #2)."""
    import tensorflow as tf

    with writer_cls(out_dir, split, shards) as w:
        for i, name in enumerate(filenames):
            with open(os.path.join(images_dir, str(name)), "rb") as f:
                jpeg = f.read()
            shape = tf.io.extract_jpeg_shape(jpeg).numpy()
            w.write(rec.make_example(
                jpeg, height=int(shape[0]), width=int(shape[1]),
                multi_hot=anno_to_multi_hot(anno[:, i]),
                anno=anno_to_known(anno[:, i])))
        return w.count


def main(argv=None):
    from absl import flags, logging
    del argv
    FLAGS = flags.FLAGS
    import scipy.io

    mat = scipy.io.loadmat(FLAGS.mat, squeeze_me=True)
    for split, list_key, anno_key, subdir in (
            ("train", "list_train", "anno_train", "train2015"),
            ("test", "list_test", "anno_test", "test2015")):
        filenames = np.atleast_1d(mat[list_key])
        anno = np.asarray(mat[anno_key])
        assert anno.shape[0] == NUM_HOI_CLASSES, anno.shape
        n = write_records(
            filenames, anno, os.path.join(FLAGS.images_dir, subdir),
            FLAGS.out_dir, split=split, shards=FLAGS.shards)
        logging.info("%s: wrote %d examples", split, n)


if __name__ == "__main__":
    from absl import app, flags

    flags.DEFINE_string("mat", None, "HICO anno.mat path")
    flags.DEFINE_string("images_dir", None,
                        "HICO images root (train2015/, test2015/)")
    flags.DEFINE_string("out_dir", None, "output TFRecord directory")
    flags.DEFINE_integer("shards", 32, "shards per split")
    flags.mark_flags_as_required(["mat", "images_dir", "out_dir"])
    app.run(main)
