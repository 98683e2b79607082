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
