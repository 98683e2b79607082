"""ResNet-v1 backbones, numerically faithful to the TF-slim variant the
reference uses (SURVEY.md sections 1 L3 and 2.1 "ResNet v1 (modified)").

Slim-specific semantics reproduced here (they differ from torchvision and
from naive "SAME" convs, and each one breaks checkpoint-converted logit
parity if gotten wrong — SURVEY.md section 7 "Hard parts" item 1):

  * ``conv2d_same``: strided convs use *explicit symmetric* padding
    (pad_total = kernel - 1, split floor/ceil) followed by a VALID conv —
    NOT TF "SAME" (which pads asymmetrically for even inputs).  The root
    7x7/2 conv pads (3, 3); bottleneck 3x3/2 convs pad (1, 1).
  * The root max-pool is 3x3 stride 2 with genuine "SAME" padding.
  * Down-sampling happens in the *last* unit of each block (units 1..n-1
    have stride 1, unit n has the block's stride) — torchvision strides the
    first unit.  Strides live on the 3x3 conv of the bottleneck; the
    projection shortcut uses the same stride.
  * Batch norm: epsilon 1e-5, decay 0.997, scale and center both on
    (slim ``resnet_arg_scope``); conv layers carry no biases.
  * v1 = post-activation: out = relu(shortcut + residual), residual's last
    1x1 conv has BN but no relu.

Module/parameter names mirror the slim variable naming
(``block1/unit_1/conv1`` ...) so the slim-checkpoint converter
(checkpoint.py) is a pure name-map.

The attentional-pooling modification: ``global_pool=False`` returns the
pre-pool (B, H', W', 2048) feature map for the pluggable head — 14x14 at
448px input, 7x7 at 224px.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any


def conv2d_same(x, conv: nn.Module, kernel_size: int, stride: int):
    """Apply ``conv`` with slim conv2d_same padding semantics."""
    if stride == 1:
        return conv(x)  # conv constructed with padding="SAME"
    pad_total = kernel_size - 1
    pad_beg = pad_total // 2
    pad_end = pad_total - pad_beg
    x = jnp.pad(
        x, [(0, 0), (pad_beg, pad_end), (pad_beg, pad_end), (0, 0)])
    return conv(x)  # conv constructed with padding="VALID"


class Bottleneck(nn.Module):
    """Slim bottleneck_v1: 1x1 -> 3x3(stride) -> 1x1, projection shortcut."""

    depth: int            # output channels (4 * depth_bottleneck)
    depth_bottleneck: int
    stride: int
    dtype: Any = jnp.float32
    norm: ModuleDef = nn.BatchNorm
    bn_momentum: float = 0.997

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = functools.partial(
            nn.Conv, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        norm = functools.partial(
            self.norm, use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32)

        depth_in = x.shape[-1]
        if depth_in == self.depth:
            # identity shortcut; subsample spatially if strided (slim
            # resnet_utils.subsample == 1x1 max pool with stride)
            shortcut = x if self.stride == 1 else x[:, ::self.stride,
                                                    ::self.stride, :]
        else:
            sc = conv(self.depth, (1, 1), strides=(self.stride, self.stride),
                      padding="VALID", name="shortcut")
            shortcut = sc(x)
            shortcut = norm(name="shortcut_bn")(shortcut)

        residual = conv(self.depth_bottleneck, (1, 1), padding="SAME",
                        name="conv1")(x)
        residual = nn.relu(norm(name="conv1_bn")(residual))

        c2 = conv(self.depth_bottleneck, (3, 3),
                  strides=(self.stride, self.stride),
                  padding="SAME" if self.stride == 1 else "VALID",
                  name="conv2")
        residual = conv2d_same(residual, c2, 3, self.stride)
        residual = nn.relu(norm(name="conv2_bn")(residual))

        residual = conv(self.depth, (1, 1), padding="SAME", name="conv3")(
            residual)
        residual = norm(name="conv3_bn")(residual)

        return nn.relu(shortcut + residual)


class ResNetV1(nn.Module):
    """Slim resnet_v1_{50,101,152}: root conv+pool, 4 bottleneck blocks.

    ``__call__`` returns the pre-pool feature map (B, H', W', 2048) when
    ``global_pool=False`` (the reference's modified tail), else (B, 2048).
    """

    stage_sizes: Sequence[int]          # units per block, e.g. (3,4,23,3)
    stage_strides: Sequence[int] = (2, 2, 2, 1)
    dtype: Any = jnp.float32
    norm: ModuleDef = nn.BatchNorm
    bn_momentum: float = 0.997          # slim batch_norm_decay
    # rematerialize each bottleneck in the backward pass: only unit
    # INPUTS are saved; the unit recomputes forward during backprop.
    # Trades ~+33% conv FLOPs for less stored-activation HBM traffic —
    # the train step is HBM-bandwidth-bound on v5e (ARCHITECTURE.md
    # roofline), so this can pay; measured per-config.
    remat_units: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, global_pool: bool = True):
        conv = functools.partial(
            nn.Conv, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        norm = functools.partial(
            self.norm, use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32)

        x = x.astype(self.dtype)
        c1 = conv(64, (7, 7), strides=(2, 2), padding="VALID", name="conv1")
        x = conv2d_same(x, c1, 7, 2)
        x = nn.relu(norm(name="conv1_bn")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        unit_cls = Bottleneck
        if self.remat_units:
            unit_cls = nn.remat(Bottleneck, static_argnums=(2,))
        for b, (num_units, block_stride) in enumerate(
                zip(self.stage_sizes, self.stage_strides), start=1):
            base_depth = 64 * (2 ** (b - 1))
            for u in range(1, num_units + 1):
                # slim: stride applies to the LAST unit of the block
                unit_stride = block_stride if u == num_units else 1
                x = unit_cls(
                    depth=base_depth * 4,
                    depth_bottleneck=base_depth,
                    stride=unit_stride,
                    dtype=self.dtype,
                    norm=self.norm,
                    bn_momentum=self.bn_momentum,
                    name=f"block{b}/unit_{u}",
                )(x, train)

        if global_pool:
            x = jnp.mean(x, axis=(1, 2))
        return x


resnet_v1_50 = functools.partial(ResNetV1, stage_sizes=(3, 4, 6, 3))
resnet_v1_101 = functools.partial(ResNetV1, stage_sizes=(3, 4, 23, 3))
resnet_v1_152 = functools.partial(ResNetV1, stage_sizes=(3, 8, 36, 3))

BACKBONES: dict[str, Callable[..., ResNetV1]] = {
    "resnet_v1_50": resnet_v1_50,
    "resnet_v1_101": resnet_v1_101,
    "resnet_v1_152": resnet_v1_152,
}
