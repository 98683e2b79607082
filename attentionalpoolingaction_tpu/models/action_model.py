"""ActionModel: backbone + flag-selected pooling head (+ optional pose head).

This is the end-to-end network of the reference's train/eval graphs
(SURVEY.md section 3.1 steps 5-6): images -> ResNet-v1 features ->
{avg | attention | pose-attention} head -> logits (+ pose heatmaps).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from attentionalpoolingaction_tpu.models.resnet import BACKBONES
from attentionalpoolingaction_tpu.models.heads import (
    AttentionalPoolingHead,
    AveragePoolingHead,
    PoseHead,
)

POOLING_TYPES = ("avg", "attention", "pose_attention")


class ActionModel(nn.Module):
    num_classes: int
    backbone: str = "resnet_v1_101"
    pooling: str = "attention"          # avg | attention | pose_attention
    rank: int = 1
    num_joints: int = 16
    use_pallas: bool = False
    dtype: Any = jnp.float32            # backbone compute dtype (bf16 on TPU)
    bn_momentum: float = 0.997
    remat_units: bool = False           # rematerialize bottlenecks in bwd

    @nn.compact
    def __call__(self, images, train: bool = False,
                 return_maps: bool = False):
        if self.pooling not in POOLING_TYPES:
            raise ValueError(f"unknown pooling {self.pooling!r}")
        feats = BACKBONES[self.backbone](
            dtype=self.dtype, bn_momentum=self.bn_momentum,
            remat_units=self.remat_units, name="resnet")(
            images, train=train, global_pool=False)
        feats = feats.astype(jnp.float32)

        out = {}
        if self.pooling == "avg":
            out["logits"] = AveragePoolingHead(
                self.num_classes, name="head")(feats)
        else:
            head = AttentionalPoolingHead(
                self.num_classes, rank=self.rank, use_pallas=self.use_pallas,
                name="head")
            if return_maps:
                out["logits"], (out["attn_maps"], out["saliency"]) = head(
                    feats, return_maps=True)
            else:
                out["logits"] = head(feats)

        if self.pooling == "pose_attention":
            out["pose_heatmaps"] = PoseHead(
                self.num_joints, name="pose_head")(feats)
        out["features"] = feats
        return out
