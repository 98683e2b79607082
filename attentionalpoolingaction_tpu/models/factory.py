"""Model factory: name -> ActionModel (the reference's nets_factory role,
SURVEY.md section 2.1 "Nets factory")."""

from __future__ import annotations

import jax.numpy as jnp

from attentionalpoolingaction_tpu.models.action_model import ActionModel
from attentionalpoolingaction_tpu.models.resnet import BACKBONES


def get_model(backbone: str = "resnet_v1_101", *, num_classes: int,
              pooling: str = "attention", rank: int = 1,
              num_joints: int = 16, use_pallas: bool = False,
              dtype=jnp.float32, bn_momentum: float = 0.997,
              remat_units: bool = False) -> ActionModel:
    if backbone not in BACKBONES:
        raise ValueError(
            f"unknown backbone {backbone!r}; available: {sorted(BACKBONES)}")
    return ActionModel(
        num_classes=num_classes,
        backbone=backbone,
        pooling=pooling,
        rank=rank,
        num_joints=num_joints,
        use_pallas=use_pallas,
        dtype=dtype,
        bn_momentum=bn_momentum,
        remat_units=remat_units,
    )
