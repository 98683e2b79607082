"""Multi-crop eval path (BASELINE.json config #5) end-to-end."""

import numpy as np

from attentionalpoolingaction_tpu import evaluate as eval_lib
from attentionalpoolingaction_tpu import train as train_lib
from attentionalpoolingaction_tpu.config import TrainConfig
from attentionalpoolingaction_tpu.data import pipeline, records
from attentionalpoolingaction_tpu.data.datasets import get_dataset


def test_multicrop_iterator_shapes(tmp_path):
    spec = get_dataset("mpii")
    p = str(tmp_path / "v.tfrecord")
    records.write_synthetic_dataset(p, spec, 5, image_size=100)
    it = pipeline.make_multicrop_eval_iterator(
        p, spec, batch_size=4, image_size=64, resize_min=80, num_crops=3)
    batches = list(it)
    assert len(batches) == 2
    assert batches[0]["image"].shape == (4, 3, 64, 64, 3)
    np.testing.assert_array_equal(batches[1]["mask"], [1, 0, 0, 0])
    # crops differ (offsets spaced along the long axis)
    b0 = batches[0]["image"][0]
    assert not np.allclose(b0[0], b0[2])


def test_multicrop_evaluate_end_to_end(tmp_path):
    spec = get_dataset("mpii")
    p = str(tmp_path / "v.tfrecord")
    records.write_synthetic_dataset(p, spec, 6, image_size=100)
    cfg = TrainConfig(
        dataset="mpii", backbone="resnet_v1_50", pooling="attention",
        image_size=64, eval_batch_size=4, eval_multicrop=3,
        bf16_backbone=False, eval_pattern=p, resize_min=80)
    state = train_lib.create_state(cfg)[0]
    results = eval_lib.evaluate(cfg, state)
    assert results["num_examples"] == 6
    assert "mAP" in results
