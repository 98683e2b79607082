"""Eval-driver behaviors: HICO Known-Object protocol end-to-end, Grain
eval wiring (input_pipeline="grain" applies to eval, not just training),
and Evaluator compile caching (--eval_every / --follow reuse the XLA
program)."""

import dataclasses

import numpy as np
import pytest

from attentionalpoolingaction_tpu import evaluate as eval_lib
from attentionalpoolingaction_tpu import train as train_lib
from attentionalpoolingaction_tpu.config import TrainConfig
from attentionalpoolingaction_tpu.data.datasets import get_dataset
from attentionalpoolingaction_tpu.data.records import write_synthetic_dataset


@pytest.fixture(scope="module")
def hico_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("hico_eval")
    spec = get_dataset("hico")
    pattern = str(tmp / "test.tfrecord")
    write_synthetic_dataset(pattern, spec, 10, image_size=40, seed=3)
    cfg = TrainConfig(
        dataset="hico", backbone="resnet_v1_50", pooling="attention",
        image_size=32, eval_batch_size=4, bf16_backbone=False,
        eval_pattern=pattern, resize_min=36)
    state, _, _, _ = train_lib.create_state(cfg)
    return cfg, state


def test_hico_ko_eval_tfdata(hico_setup):
    cfg, state = hico_setup
    res = eval_lib.evaluate(cfg, state, return_per_class=True)
    assert res["num_examples"] == 10
    assert "mAP_ko" in res and np.isfinite(res["mAP_ko"])
    assert "per_class_ap_ko" in res
    # KO evaluates a (generally different) masked subset per class
    assert res["mAP_ko"] != res["mAP"] or res["num_eval_classes"] == 0


def test_hico_ko_eval_grain(hico_setup):
    cfg, state = hico_setup
    cfg_grain = dataclasses.replace(cfg, input_pipeline="grain")
    res = eval_lib.evaluate(cfg_grain, state)
    assert res["num_examples"] == 10
    assert "mAP_ko" in res and np.isfinite(res["mAP_ko"])


def test_grain_and_tfdata_eval_agree_on_labels(hico_setup):
    """Same records, same label/anno stream through both input pipelines
    (images differ slightly: cv2 vs tf resize kernels)."""
    cfg, _ = hico_setup
    spec = get_dataset(cfg.dataset)
    tf_batches = list(eval_lib.make_eval_input(cfg, spec))
    grain_batches = list(eval_lib.make_eval_input(
        dataclasses.replace(cfg, input_pipeline="grain"), spec))
    a = np.concatenate([b["label"] for b in tf_batches])
    g = np.concatenate([b["label"] for b in grain_batches])
    np.testing.assert_array_equal(a, g)
    a = np.concatenate([b["anno"] for b in tf_batches])
    g = np.concatenate([b["anno"] for b in grain_batches])
    np.testing.assert_array_equal(a, g)
    assert np.any(a == -1) and np.any(a == 0) and np.any(a == 1)


def test_evaluator_caches_compilation(hico_setup):
    cfg, state = hico_setup
    evaluator = eval_lib.Evaluator(cfg)
    r1 = evaluator(state, max_batches=1)
    r2 = evaluator(state, max_batches=1)
    assert r1["mAP"] == r2["mAP"]
    # one XLA program total across both evaluations
    assert evaluator.step_fn._cache_size() == 1
