"""Metrics vs sklearn oracle (SURVEY.md section 4 item 1)."""

import numpy as np
from sklearn.metrics import average_precision_score

from attentionalpoolingaction_tpu.ops.metrics import (
    accuracy,
    average_precision,
    mean_average_precision,
    mean_average_precision_known,
    video_average_logits,
)


def test_ap_matches_sklearn(rng):
    for _ in range(10):
        labels = (rng.random(100) > 0.7).astype(np.float64)
        scores = rng.normal(size=100)
        if labels.sum() == 0:
            labels[0] = 1
        np.testing.assert_allclose(
            average_precision(labels, scores),
            average_precision_score(labels, scores), rtol=1e-10)


def test_ap_with_ties(rng):
    labels = np.array([1, 0, 1, 0, 1, 1, 0, 0])
    scores = np.array([0.5, 0.5, 0.5, 0.2, 0.2, 0.9, 0.9, 0.1])
    np.testing.assert_allclose(
        average_precision(labels, scores),
        average_precision_score(labels, scores), rtol=1e-10)


def test_map_multilabel(rng):
    labels = (rng.random((50, 8)) > 0.6).astype(np.float64)
    labels[:, 3] = 0  # empty class must be skipped
    scores = rng.normal(size=(50, 8))
    m, aps = mean_average_precision(labels, scores)
    assert np.isnan(aps[3])
    ref = np.mean([average_precision_score(labels[:, c], scores[:, c])
                   for c in range(8) if c != 3])
    np.testing.assert_allclose(m, ref, rtol=1e-10)


def test_map_known_object(rng):
    """KO mAP drops unknown (anno==0) pairs per class; equals the default
    mAP when everything is known, differs when unknowns are misranked."""
    anno = rng.choice([1, -1, 0], size=(60, 5), p=[0.3, 0.4, 0.3])
    anno[0, :] = 1  # every class has a known positive
    scores = rng.normal(size=(60, 5))

    ko, aps = mean_average_precision_known(anno, scores)
    for c in range(5):
        known = anno[:, c] != 0
        ref = average_precision_score(
            (anno[known, c] > 0).astype(float), scores[known, c])
        np.testing.assert_allclose(aps[c], ref, rtol=1e-10)
    np.testing.assert_allclose(ko, np.mean(aps), rtol=1e-10)

    # fully-known anno == default protocol on labels = (anno > 0)
    full = np.where(anno == 0, -1, anno)
    ko_full, _ = mean_average_precision_known(full, scores)
    m_default, _ = mean_average_precision((full > 0).astype(float), scores)
    np.testing.assert_allclose(ko_full, m_default, rtol=1e-10)

    # an unknown high-scoring negative hurts default mAP but not KO
    anno2 = np.full((4, 1), 1)
    anno2[1:, 0] = 0
    scores2 = np.array([[0.1], [0.9], [0.8], [0.7]])
    ko2, _ = mean_average_precision_known(anno2, scores2)
    m2, _ = mean_average_precision(
        (anno2 > 0).astype(float), scores2)
    assert ko2 == 1.0 and m2 < 1.0

    # nothing known -> 0.0, NaN aps
    ko3, aps3 = mean_average_precision_known(np.zeros((4, 2)), rng.normal(
        size=(4, 2)))
    assert ko3 == 0.0 and np.isnan(aps3).all()


def test_accuracy():
    labels = np.array([0, 1, 2])
    scores = np.array([[0.9, 0.1, 0.0], [0.1, 0.2, 0.7], [0.0, 0.1, 0.9]])
    np.testing.assert_allclose(accuracy(labels, scores), 2.0 / 3.0)


def test_video_average():
    vids = np.array([7, 3, 7, 3, 9])
    logits = np.array([[1.0, 0], [0, 2.0], [3.0, 0], [0, 4.0], [5.0, 6.0]])
    labels = np.array([0, 1, 0, 1, 1])
    uniq, avg, vl = video_average_logits(vids, logits, labels)
    np.testing.assert_array_equal(uniq, [3, 7, 9])
    np.testing.assert_allclose(avg, [[0, 3.0], [2.0, 0], [5.0, 6.0]])
    np.testing.assert_array_equal(vl, [1, 0, 1])
