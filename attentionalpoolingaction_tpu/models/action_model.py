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
        # Video clips: a 5-D (B, T, H, W, C) batch runs the backbone
        # per-frame (frames fold into the batch dim — one big MXU-friendly
        # conv batch) and the POOLING spans all T*h*w spatiotemporal
        # positions: the head's second-order attention then attends over
        # space AND time in one softmax-free bilinear form, instead of the
        # reference protocol's per-frame logits averaged post-hoc.  The
        # heads are position-count-agnostic, so folding T into the
        # feature-map height needs no head changes.
        clip_t = None
        if images.ndim == 5:
            if self.pooling == "pose_attention":
                raise ValueError(
                    "pose_attention pooling is per-image (pose targets "
                    "have no temporal dim) — use pooling='attention' or "
                    "'avg' for video clips")
            b, clip_t = images.shape[:2]
            images = images.reshape((b * clip_t,) + images.shape[2:])
        feats = BACKBONES[self.backbone](
            dtype=self.dtype, bn_momentum=self.bn_momentum,
            remat_units=self.remat_units, name="resnet")(
            images, train=train, global_pool=False)
        feats = feats.astype(jnp.float32)
        if clip_t is not None:
            bt, fh, fw, ff = feats.shape
            feats = feats.reshape(bt // clip_t, clip_t * fh, fw, ff)

        out = {}
        if self.pooling == "avg":
            out["logits"] = AveragePoolingHead(
                self.num_classes, name="head")(feats)
        else:
            head = AttentionalPoolingHead(
                self.num_classes, rank=self.rank, use_pallas=self.use_pallas,
                name="head")
            if return_maps:
                out["logits"], (top, bot) = head(feats, return_maps=True)
                if clip_t is not None:
                    # expose per-frame maps: (B, T, h, w, ...) — the
                    # temporal attention distribution is a byproduct
                    top = top.reshape((top.shape[0], clip_t, -1) +
                                      top.shape[2:])
                    bot = bot.reshape(bot.shape[0], clip_t, -1,
                                      bot.shape[2])
                out["attn_maps"], out["saliency"] = top, bot
            else:
                out["logits"] = head(feats)

        if self.pooling == "pose_attention":
            out["pose_heatmaps"] = PoseHead(
                self.num_joints, name="pose_head")(feats)
        out["features"] = feats
        return out
