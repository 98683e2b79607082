"""Record-container converter: TFRecord <-> ArrayRecord.

ArrayRecord is the random-access-native container (its footer is the
index), so Grain global shuffle needs no sidecar .idx files; existing
TFRecord datasets convert in place with:

    python -m attentionalpoolingaction_tpu.data.reformat \
        --src '/data/mpii/train-*.tfrecord' --dst_dir /data/mpii_ar

Direction is inferred per file: *.tfrecord -> *.array_record and
*.array_record -> *.tfrecord.  Only the container changes; the payload
stays serialized tf.train.Example bytes, so datasets.py schemas and both
pipelines keep working unchanged.
"""

from __future__ import annotations

import glob
import os

from absl import app, flags, logging

from attentionalpoolingaction_tpu.data import records

FLAGS = flags.FLAGS
flags.DEFINE_string("src", None, "source file glob")
flags.DEFINE_string("dst_dir", None, "output directory")
flags.mark_flag_as_required("src")
flags.mark_flag_as_required("dst_dir")

_AR_EXTS = (".array_record", ".arrayrecord")


def _read_array_record(path):
    from grain.sources import ArrayRecordDataSource

    src = ArrayRecordDataSource([path])
    for i in range(len(src)):
        yield src[i]


def reformat_file(src_path: str, dst_dir: str) -> str:
    base, ext = os.path.splitext(os.path.basename(src_path))
    if ext in _AR_EXTS:
        dst = os.path.join(dst_dir, base + ".tfrecord")
        records.write_tfrecord(dst, _read_array_record(src_path))
    else:
        dst = os.path.join(dst_dir, base + ".array_record")
        records.write_array_record(dst, records.read_tfrecord(src_path))
    return dst


def main(argv):
    del argv
    paths = sorted(glob.glob(FLAGS.src))
    if not paths:
        raise SystemExit(f"no files match {FLAGS.src}")
    os.makedirs(FLAGS.dst_dir, exist_ok=True)
    for p in paths:
        dst = reformat_file(p, FLAGS.dst_dir)
        logging.info("%s -> %s", p, dst)


if __name__ == "__main__":
    app.run(main)
