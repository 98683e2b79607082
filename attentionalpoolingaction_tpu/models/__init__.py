"""Model zoo: slim-variant ResNet-v1 backbones + pooling heads + factory."""

from attentionalpoolingaction_tpu.models.resnet import (
    ResNetV1,
    resnet_v1_50,
    resnet_v1_101,
    resnet_v1_152,
)
from attentionalpoolingaction_tpu.models.heads import (
    AttentionalPoolingHead,
    AveragePoolingHead,
    PoseHead,
)
from attentionalpoolingaction_tpu.models.action_model import ActionModel
from attentionalpoolingaction_tpu.models.factory import get_model

__all__ = [
    "ResNetV1",
    "resnet_v1_50",
    "resnet_v1_101",
    "resnet_v1_152",
    "AttentionalPoolingHead",
    "AveragePoolingHead",
    "PoseHead",
    "ActionModel",
    "get_model",
]
