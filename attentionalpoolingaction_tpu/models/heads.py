"""Pooling heads: average pooling (baseline), attentional pooling (the
paper's contribution), and the auxiliary pose head.

Reference behavior: SURVEY.md sections 2.1 ("Attentional pooling head",
"Pose-regularization head") and 3.1 step 6.  The heads are flag-selected in
the reference (avg / attention / pose-attention); here they are modules
selected by models.factory / ActionModel.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from attentionalpoolingaction_tpu.ops import attn_pool as ap_ops


class AveragePoolingHead(nn.Module):
    """Global average pool + 1x1-conv logits (the reference's baseline head,
    slim's standard resnet tail)."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        # feats: (B, H, W, F)
        pooled = jnp.mean(feats.astype(jnp.float32), axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        param_dtype=jnp.float32, name="logits")(pooled)


class AttentionalPoolingHead(nn.Module):
    """Rank-P second-order attentional pooling.

    Parameters are the two 1x1 convs of the reference (top-down f->C*P with
    bias, bottom-up f->P with bias); the computation is the factorized
    ``A^T (X^T (X b))`` form (ops/attn_pool.py) or the fused Pallas kernel
    when ``use_pallas`` and running on TPU.
    """

    num_classes: int
    rank: int = 1
    use_pallas: bool = False
    dtype: Any = jnp.float32
    init_stddev: float | None = None    # default: 1/sqrt(n*f) per branch

    @nn.compact
    def __call__(self, feats, return_maps: bool = False):
        b, h, w, f = feats.shape
        x = feats.reshape(b, h * w, f)

        # The logit is a product of two linear maps, so its initial scale is
        # ~ std^2 * n * f * var(x).  A fixed 0.01 std (slim's conv default)
        # puts random-init logits in the hundreds, saturating softmax and
        # making clipped-SGD steps microscopic.  Scale each branch by
        # (n*f)^-1/2 so initial logits are O(var(x)) instead; loading
        # pretrained/reference weights overrides this, preserving parity.
        std = self.init_stddev or float((h * w * f)) ** -0.5
        init = nn.initializers.truncated_normal(stddev=std)
        attn_w = self.param("attn_w", init, (f, self.num_classes, self.rank),
                            jnp.float32)
        attn_b = self.param("attn_b", nn.initializers.zeros,
                            (self.num_classes, self.rank), jnp.float32)
        sal_w = self.param("sal_w", init, (f, self.rank), jnp.float32)
        sal_b = self.param("sal_b", nn.initializers.zeros, (self.rank,),
                           jnp.float32)

        if self.use_pallas and not return_maps:
            import jax

            from attentionalpoolingaction_tpu.ops.attn_pool_pallas import (
                attentional_pool_fused)
            # interpret mode off-TPU (CPU tests); compiled Mosaic on TPU
            logits = attentional_pool_fused(
                x, attn_w, attn_b, sal_w, sal_b,
                jax.default_backend() != "tpu")
        else:
            logits = ap_ops.attentional_pool(x, attn_w, attn_b, sal_w, sal_b)

        if return_maps:
            top, bot = ap_ops.attention_maps(x, attn_w, attn_b, sal_w, sal_b)
            return logits, (top.reshape(b, h, w, -1), bot.reshape(b, h, w))
        return logits


class PoseHead(nn.Module):
    """Auxiliary pose head: 1x1 conv f -> num_joints (+1 background channel,
    matching the reference's pose-regularized variant) predicting heatmaps at
    feature resolution."""

    num_joints: int = 16
    with_background: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        out_ch = self.num_joints + (1 if self.with_background else 0)
        h = nn.Conv(out_ch, (1, 1), dtype=jnp.float32,
                    param_dtype=jnp.float32, name="pose_conv")(
                        feats.astype(jnp.float32))
        return h
