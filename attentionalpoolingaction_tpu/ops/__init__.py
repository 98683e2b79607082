"""Core numerical ops: attentional pooling, heatmap rendering, metrics."""

from attentionalpoolingaction_tpu.ops.attn_pool import (
    attentional_pool,
    attentional_pool_oracle,
    attention_maps,
)
from attentionalpoolingaction_tpu.ops.heatmap import (
    render_gaussian_heatmaps,
    transform_keypoints,
)

__all__ = [
    "attentional_pool",
    "attentional_pool_oracle",
    "attention_maps",
    "render_gaussian_heatmaps",
    "transform_keypoints",
]
