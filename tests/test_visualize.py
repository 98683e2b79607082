"""Attention-map visualization utilities (reference L8)."""

import jax
import jax.numpy as jnp
import numpy as np

from attentionalpoolingaction_tpu.models import ActionModel
from attentionalpoolingaction_tpu.utils import visualize as viz


def test_overlay_heatmap_shapes(rng):
    img = rng.integers(0, 255, (64, 48, 3)).astype(np.uint8)
    attn = rng.normal(size=(4, 3))
    out = viz.overlay_heatmap(img, attn)
    assert out.shape == (64, 48, 3)
    assert out.dtype == np.uint8


def test_normalize_map_constant():
    m = viz.normalize_map(np.full((3, 3), 7.0))
    np.testing.assert_array_equal(m, np.zeros((3, 3)))


def test_attention_summary_hook(tmp_path, rng):
    """The train-loop image-summary hook: lazily loads a probe batch,
    renders overlays with the CURRENT params, writes via the metric
    writer's write_images."""
    from attentionalpoolingaction_tpu.config import TrainConfig
    from attentionalpoolingaction_tpu.data.datasets import get_dataset
    from attentionalpoolingaction_tpu.data.records import (
        write_synthetic_dataset)
    from attentionalpoolingaction_tpu import train as train_lib

    spec = get_dataset("mpii")
    write_synthetic_dataset(str(tmp_path / "val.tfrecord"), spec, 4,
                            image_size=72, seed=0)
    cfg = TrainConfig(dataset="mpii", backbone="resnet_v1_50",
                      pooling="attention", rank=1, image_size=64,
                      batch_size=4, learning_rate=1e-3,
                      grad_clip_norm=10.0, lr_schedule="constant",
                      bf16_backbone=False, resize_min=72,
                      eval_pattern=str(tmp_path / "val.tfrecord"),
                      eval_batch_size=4)
    state, _, _, _ = train_lib.create_state(cfg)

    written = {}

    class FakeWriter:
        def write_images(self, step, images):
            written[step] = images

    hook = viz.make_attention_summary_hook(cfg, FakeWriter(), every=2,
                                           num_images=2)
    hook(1, state, {})                  # off-cycle: no write
    hook(2, state, {})
    assert list(written) == [2]
    imgs = written[2]["attention/top_down"]
    assert imgs.shape == (2, 64, 64, 3) and imgs.dtype == np.uint8
    assert written[2]["attention/saliency"].shape == (2, 64, 64, 3)

    import dataclasses

    import pytest

    with pytest.raises(ValueError, match="attention head"):
        viz.make_attention_summary_hook(
            dataclasses.replace(cfg, pooling="avg"), FakeWriter(), every=2)


def test_attention_overlays_end_to_end(rng):
    model = ActionModel(num_classes=6, backbone="resnet_v1_50",
                        pooling="attention")
    images = jnp.asarray(rng.normal(size=(2, 64, 64, 3)) * 20, jnp.float32)
    variables = model.init(jax.random.key(0), images, train=False)
    out = viz.attention_overlays(model, variables, images)
    assert len(out["top_down"]) == 2
    assert out["top_down"][0].shape == (64, 64, 3)
    assert out["saliency"][0].dtype == np.uint8
    assert out["attn_maps"].shape == (2, 2, 2, 6)
    # explicit class selection
    out2 = viz.attention_overlays(model, variables, images, class_idx=3)
    assert (out2["class_idx"] == 3).all()


def test_clip_attention_overlays(rng):
    """Clip visualization: T per-frame overlays from ONE spatiotemporal
    forward, a video-level predicted class, and a temporal attention
    distribution that sums to 1."""
    model = ActionModel(num_classes=6, backbone="resnet_v1_50",
                        pooling="attention", rank=1)
    clip = np.asarray(rng.normal(0, 60, size=(3, 64, 64, 3)), np.float32)
    variables = model.init(jax.random.key(0),
                           jnp.asarray(clip[None][:, 0]), train=False)
    out = viz.clip_attention_overlays(model, variables, clip)
    assert len(out["top_down"]) == 3 and len(out["saliency"]) == 3
    for img in out["top_down"] + out["saliency"]:
        assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert 0 <= out["class_idx"] < 6
    ta = out["temporal_attention"]
    assert ta.shape == (3,)
    np.testing.assert_allclose(ta.sum(), 1.0, atol=1e-5)
    # explicit class selection
    out2 = viz.clip_attention_overlays(model, variables, clip, class_idx=2)
    assert out2["class_idx"] == 2
