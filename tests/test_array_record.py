"""ArrayRecord container: writer, source dispatch, pipeline equivalence."""

import numpy as np
import pytest

from attentionalpoolingaction_tpu.data import records
from attentionalpoolingaction_tpu.data.datasets import get_dataset
from attentionalpoolingaction_tpu.data.native_io import make_source
from attentionalpoolingaction_tpu.data import grain_pipeline as gp


@pytest.fixture
def mpii_both_formats(tmp_path):
    spec = get_dataset("mpii")
    tfr = str(tmp_path / "train.tfrecord")
    records.write_synthetic_dataset(tfr, spec, 10, image_size=72)
    ar = str(tmp_path / "train.array_record")
    records.write_array_record(ar, records.read_tfrecord(tfr))
    return spec, tfr, ar


def test_roundtrip_bytes_identical(mpii_both_formats):
    _, tfr, ar = mpii_both_formats
    want = list(records.read_tfrecord(tfr))
    src = make_source(ar)
    assert len(src) == len(want)
    assert all(bytes(src[i]) == want[i] for i in range(len(want)))


def test_make_source_dispatch(mpii_both_formats, tmp_path):
    _, tfr, ar = mpii_both_formats
    assert type(make_source(tfr)).__name__ == "TFRecordDataSource"
    assert type(make_source(ar)).__name__ == "ArrayRecordDataSource"
    with pytest.raises(ValueError, match="mixed"):
        make_source([tfr, ar])


def test_grain_pipeline_format_equivalence(mpii_both_formats):
    spec, tfr, ar = mpii_both_formats
    kw = dict(batch_size=4, image_size=64, resize_min=72, seed=3)
    b_tf = next(iter(gp.make_train_dataset(tfr, spec, **kw)))
    b_ar = next(iter(gp.make_train_dataset(ar, spec, **kw)))
    assert set(b_tf) == set(b_ar)
    for k in b_tf:
        np.testing.assert_array_equal(b_tf[k], b_ar[k])


def test_eval_dataset_from_array_record(mpii_both_formats):
    spec, _, ar = mpii_both_formats
    batches = list(gp.make_eval_dataset(ar, spec, batch_size=4,
                                        image_size=64, resize_min=72))
    n = sum(int(b["mask"].sum()) for b in batches)
    assert n == 10
    assert batches[0]["image"].shape == (4, 64, 64, 3)


def test_hmdb_video_sampling_from_array_record(tmp_path):
    """Video-indexed HMDB training works from an ArrayRecord source: the
    index builder's non-indexed fallback (no .files attr) scans the
    source directly."""
    spec = get_dataset("hmdb51")
    tfr = str(tmp_path / "hmdb.tfrecord")
    records.write_synthetic_dataset(tfr, spec, 8, image_size=60, seed=0,
                                    frames_per_video=4)
    ar = str(tmp_path / "hmdb.array_record")
    records.write_array_record(ar, records.read_tfrecord(tfr))

    src = make_source(ar)
    by_vid = gp.build_video_index(src, spec)
    assert sum(len(v) for v in by_vid.values()) == 8
    assert all(len(v) == 4 for v in by_vid.values())   # 2 videos x 4 frames

    ds = gp.make_video_train_dataset(ar, spec, batch_size=2, image_size=48,
                                     resize_min=60, seed=1)
    batch = next(iter(ds))
    assert batch["image"].shape == (2, 48, 48, 3)
    assert set(batch) >= {"label", "video_id", "frame"}


def test_reformat_cli_roundtrip(mpii_both_formats, tmp_path):
    from attentionalpoolingaction_tpu.data.reformat import reformat_file

    _, tfr, _ = mpii_both_formats
    out_dir = str(tmp_path / "ar")
    import os
    os.makedirs(out_dir)
    ar = reformat_file(tfr, out_dir)
    assert ar.endswith(".array_record")
    back_dir = str(tmp_path / "back")
    os.makedirs(back_dir)
    tfr2 = reformat_file(ar, back_dir)
    assert list(records.read_tfrecord(tfr2)) == \
        list(records.read_tfrecord(tfr))
