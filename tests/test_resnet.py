"""ResNet-v1 slim-variant: shapes, param counts, model assembly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attentionalpoolingaction_tpu.models import (
    ActionModel,
    get_model,
    resnet_v1_50,
    resnet_v1_101,
)


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def test_resnet50_param_count():
    """Slim resnet_v1_50 backbone (no logits layer) has 23,508,032 params."""
    model = resnet_v1_50()
    var = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    assert n_params(var["params"]) == 23_508_032


def test_resnet101_param_count():
    """Slim resnet_v1_101 backbone (no logits layer) has 42,500,160 params."""
    model = resnet_v1_101()
    var = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    assert n_params(var["params"]) == 42_500_160


@pytest.mark.parametrize("size,hw", [(224, 7), (448, 14)])
def test_feature_map_shape(size, hw):
    model = resnet_v1_50()
    var = model.init(jax.random.key(0), jnp.zeros((1, size, size, 3)))
    out = model.apply(var, jnp.zeros((2, size, size, 3)), global_pool=False)
    assert out.shape == (2, hw, hw, 2048)


def test_global_pool_shape():
    model = resnet_v1_50()
    var = model.init(jax.random.key(0), jnp.zeros((1, 96, 96, 3)))
    out = model.apply(var, jnp.zeros((2, 96, 96, 3)))
    assert out.shape == (2, 2048)


def test_odd_input_size():
    """450px (the paper's high-res config) must work: slim conv2d_same
    handles arbitrary sizes."""
    model = resnet_v1_50()
    var = model.init(jax.random.key(0), jnp.zeros((1, 450, 450, 3)))
    out = model.apply(var, jnp.zeros((1, 450, 450, 3)), global_pool=False)
    assert out.shape[1:] == (15, 15, 2048)


def test_batchnorm_train_updates_stats():
    model = resnet_v1_50()
    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
    var = model.init(jax.random.key(0), x)
    out, updates = model.apply(var, x, train=True, mutable=["batch_stats"])
    before = var["batch_stats"]["conv1_bn"]["mean"]
    after = updates["batch_stats"]["conv1_bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


@pytest.mark.parametrize("pooling", ["avg", "attention", "pose_attention"])
def test_action_model(pooling):
    model = ActionModel(num_classes=11, backbone="resnet_v1_50",
                        pooling=pooling, rank=2)
    x = jnp.zeros((2, 64, 64, 3))
    var = model.init(jax.random.key(0), x)
    out = model.apply(var, x)
    assert out["logits"].shape == (2, 11)
    if pooling == "pose_attention":
        assert out["pose_heatmaps"].shape == (2, 2, 2, 17)


def test_action_model_maps():
    model = get_model("resnet_v1_50", num_classes=5, pooling="attention")
    x = jnp.zeros((1, 64, 64, 3))
    var = model.init(jax.random.key(0), x)
    out = model.apply(var, x, return_maps=True)
    assert out["attn_maps"].shape == (1, 2, 2, 5)
    assert out["saliency"].shape == (1, 2, 2)


def test_bf16_backbone():
    model = ActionModel(num_classes=5, backbone="resnet_v1_50",
                        dtype=jnp.bfloat16)
    x = jnp.zeros((1, 64, 64, 3))
    var = model.init(jax.random.key(0), x)
    out = model.apply(var, x)
    assert out["logits"].dtype == jnp.float32  # head accumulates f32
