"""Slim-semantics parity gate against an INDEPENDENT TF2-ops oracle.

The Flax model's logits under exported slim weights must match a from-
scratch TF2 re-implementation of the slim ResNet-v1 + attentional-pooling
forward (tests/tf_slim_oracle.py) — replacing the round-1 self-referential
golden NPZ as parity evidence while /root/reference is empty (VERDICT r1
"Next round" #2; SURVEY.md section 7 "Hard parts" item 1).

Covers: conv2d_same explicit padding (odd 450px input included — the size
where SAME-vs-explicit padding diverges), BN eps/stats, last-unit block
striding, shortcut subsampling, root maxpool, and the pooling math
(naive materialized form vs the factorized identity).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attentionalpoolingaction_tpu import checkpoint as ckpt_lib
from attentionalpoolingaction_tpu.models import ActionModel

from tf_slim_oracle import full_forward_logits


def _setup(backbone, image_size, num_classes, rank, tmp_path, seed=0):
    model = ActionModel(num_classes=num_classes, backbone=backbone,
                        pooling="attention", rank=rank)
    variables = model.init(
        jax.random.key(seed), jnp.zeros((1, image_size, image_size, 3)),
        train=False)
    # non-trivial BN statistics so the oracle's moving-stat math is tested
    warm = jax.random.normal(jax.random.key(1),
                             (2, image_size, image_size, 3))
    _, updates = model.apply(variables, warm, train=True,
                             mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": updates["batch_stats"]}
    path = str(tmp_path / "oracle" / "model.ckpt")
    ckpt_lib.export_slim_checkpoint(variables, path, model_scope=backbone)
    return model, variables, path


@pytest.mark.parametrize("image_size,rank", [(224, 1), (450, 3)])
def test_flax_matches_tf_oracle_resnet50(image_size, rank, tmp_path):
    backbone = "resnet_v1_50"
    model, variables, ckpt = _setup(backbone, image_size, 11, rank,
                                    tmp_path)
    images = np.asarray(jax.random.normal(
        jax.random.key(2), (2, image_size, image_size, 3)), np.float32)

    got = np.asarray(model.apply(variables, images)["logits"])
    want = full_forward_logits(images, ckpt, backbone,
                               variables["params"]["head"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4 * np.abs(
        want).max())


@pytest.mark.slow
def test_flax_matches_tf_oracle_resnet101(tmp_path):
    backbone = "resnet_v1_101"
    model, variables, ckpt = _setup(backbone, 224, 5, 1, tmp_path)
    images = np.asarray(jax.random.normal(
        jax.random.key(3), (1, 224, 224, 3)), np.float32)
    got = np.asarray(model.apply(variables, images)["logits"])
    want = full_forward_logits(images, ckpt, backbone,
                               variables["params"]["head"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4 * np.abs(
        want).max())


def test_oracle_discovers_structure(tmp_path):
    """The oracle reconstructs block/unit structure from names alone."""
    from tf_slim_oracle import discover_blocks, load_slim_vars

    _, _, ckpt = _setup("resnet_v1_50", 64, 3, 1, tmp_path)
    blocks = discover_blocks(load_slim_vars(ckpt), "resnet_v1_50")
    assert {b: len(u) for b, u in blocks.items()} == {1: 3, 2: 4, 3: 6,
                                                      4: 3}
    assert blocks[3] == [1, 2, 3, 4, 5, 6]


def test_flax_matches_tf_oracle_pose_variant(tmp_path):
    """The paper's best model (pose-regularized attention): logits AND
    pose heatmaps from the shared features match the independent oracle."""
    from tf_slim_oracle import full_forward_pose

    backbone = "resnet_v1_50"
    model = ActionModel(num_classes=7, backbone=backbone,
                        pooling="pose_attention", rank=2)
    variables = model.init(jax.random.key(4),
                           jnp.zeros((1, 224, 224, 3)), train=False)
    warm = jax.random.normal(jax.random.key(5), (2, 224, 224, 3))
    _, updates = model.apply(variables, warm, train=True,
                             mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": updates["batch_stats"]}
    ckpt = str(tmp_path / "oracle" / "model.ckpt")
    ckpt_lib.export_slim_checkpoint(variables, ckpt, model_scope=backbone)

    images = np.asarray(jax.random.normal(
        jax.random.key(6), (2, 224, 224, 3)), np.float32)
    out = model.apply(variables, images)
    want_logits, want_maps = full_forward_pose(
        images, ckpt, backbone, variables["params"]["head"],
        variables["params"]["pose_head"])
    np.testing.assert_allclose(
        np.asarray(out["logits"]), want_logits, rtol=1e-4,
        atol=1e-4 * np.abs(want_logits).max())
    np.testing.assert_allclose(
        np.asarray(out["pose_heatmaps"]), want_maps, rtol=1e-4,
        atol=1e-4 * np.abs(want_maps).max())
