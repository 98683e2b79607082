"""Serving-path inference: BN-folded functional forward with optional
post-training int8 quantization.

The training graph (models/resnet.py) keeps BatchNorm as a separate op so
running statistics update; at serving time BN in eval mode is an affine
map, so it folds into the preceding conv's epilogue:

    BN(conv(x, W)) = conv(x, W) * s + t,   s = gamma / sqrt(var + eps),
                                           t = beta - mean * s.

This module walks the exported Flax param/batch_stats pytree (the same
single source of truth the TF2 oracle consumes — tests/tf_slim_oracle.py)
and rebuilds the forward pass as plain `lax.conv_general_dilated` calls
with the fold applied, preserving the slim conv2d_same padding semantics
of models/resnet.py line-for-line.  Two modes:

  * float (bf16/f32): the parity anchor — matches `ActionModel.apply`
    logits to ~1e-5 relative (tests/test_inference.py).
  * int8: weights quantized per-output-channel symmetric int8 with the BN
    scale folded into the dequantization constant, activations quantized
    int8 (static per-conv scales from :func:`calibrate_act_scales`, or
    dynamic per-example absmax when no calibration is supplied — each
    example quantizes independently of its batch-mates).  Convs run on the
    MXU's int8 path (v5e: 394 TOP/s vs 197 TFLOP/s bf16) and HBM traffic
    for weights/activations halves vs bf16.

The reference has no quantized/serving path (SURVEY.md section 1: no
serving layer) — this is a TPU-native extension for the deployment goal;
the attentional-pooling head itself stays f32 (it is ~2% of the FLOPs and
its second-order product is precision-sensitive).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from attentionalpoolingaction_tpu.models.resnet import BACKBONES
from attentionalpoolingaction_tpu.ops import attn_pool as ap_ops

_DN = ("NHWC", "HWIO", "NHWC")
_STAGE_STRIDES = (2, 2, 2, 1)


def _stage_sizes(backbone: str):
    try:
        return BACKBONES[backbone].keywords["stage_sizes"]
    except KeyError:
        raise ValueError(f"unknown backbone {backbone!r}") from None


def _fold(conv_params, bn_params, bn_stats, eps=1e-5):
    """Fold eval-mode BatchNorm into the conv's output scale/bias."""
    scale = bn_params["scale"] * lax.rsqrt(bn_stats["var"] + eps)
    return {
        "kernel": jnp.asarray(conv_params["kernel"], jnp.float32),
        "scale": jnp.asarray(scale, jnp.float32),
        "bias": jnp.asarray(bn_params["bias"] - bn_stats["mean"] * scale,
                            jnp.float32),
    }


def fold_backbone(variables, backbone: str = "resnet_v1_101"):
    """variables (params + batch_stats of ActionModel) -> folded pytree.

    Keys mirror the param-tree paths ("conv1", "block1/unit_1" -> unit
    dict) so calibration ids and debugging line up with checkpoint names.
    """
    params = variables["params"]["resnet"]
    stats = variables["batch_stats"]["resnet"]
    folded = {"conv1": _fold(params["conv1"], params["conv1_bn"],
                             stats["conv1_bn"])}
    for b, num_units in enumerate(_stage_sizes(backbone), start=1):
        for u in range(1, num_units + 1):
            key = f"block{b}/unit_{u}"
            up, us = params[key], stats[key]
            unit = {c: _fold(up[c], up[f"{c}_bn"], us[f"{c}_bn"])
                    for c in ("conv1", "conv2", "conv3")}
            if "shortcut" in up:
                unit["shortcut"] = _fold(up["shortcut"], up["shortcut_bn"],
                                         us["shortcut_bn"])
            folded[key] = unit
    return folded


def quantize_folded(folded):
    """Per-output-channel symmetric int8 weights; BN scale folded into the
    dequant constant so inference does acc_i32 * scale + bias, nothing else.
    """
    def q(layer):
        if "kernel" not in layer:        # nested unit dict
            return {k: q(v) for k, v in layer.items()}
        w = layer["kernel"]
        wmax = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-8)
        wscale = wmax / 127.0
        return {
            "kernel_q": jnp.round(w / wscale).astype(jnp.int8),
            "scale": wscale * layer["scale"],   # combined dequant (per-chan)
            "bias": layer["bias"],
        }
    return {k: q(v) for k, v in folded.items()}


def _conv(x, layer, kernel_size, stride, *, cid, act_scales, capture, dtype,
          dot_1x1=False):
    """One folded conv with slim conv2d_same padding (models/resnet.py).

    ``dot_1x1``: compute 1x1 stride-1 convs as 2D ``dot_general`` over
    (B*H*W, Cin) instead of ``lax.conv``.  Measured motivation (v5e,
    scripts/tpu_fwd_experiments.py): XLA's int8 MATMUL runs at 323-347
    TOP/s (~88% of the 394 int8 peak) while its int8 CONV lowering stays
    near the bf16 rate (1.06-1.17x) — the double-rate MXU path is only
    reachable through dot.  End-to-end verdict: 1.00x at 224px (XLA's
    layout copies absorb exactly the matmul gain) and 0.80-0.90x at
    448px (larger maps, costlier relayouts) — so the DEFAULT (False) is
    the measured optimum and this flag exists as the reproducible probe;
    re-measure before ever enabling it.
    """
    if capture is not None:              # calibration pass (eager only)
        capture[cid] = max(capture.get(cid, 0.0),
                           float(jnp.max(jnp.abs(x))))
    if stride == 1:
        padding = "SAME"
    else:
        pad_total = kernel_size - 1
        pad_beg = pad_total // 2
        x = jnp.pad(x, [(0, 0), (pad_beg, pad_total - pad_beg),
                        (pad_beg, pad_total - pad_beg), (0, 0)])
        padding = "VALID"
    strides = (stride, stride)
    as_dot = dot_1x1 and kernel_size == 1 and stride == 1

    def matmul_or_conv(inp, kernel, acc_dtype):
        if as_dot:
            b, h, w, cin = inp.shape
            out = lax.dot_general(
                inp.reshape(b * h * w, cin), kernel.reshape(cin, -1),
                (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype)
            return out.reshape(b, h, w, -1)
        return lax.conv_general_dilated(
            inp, kernel, strides, padding, dimension_numbers=_DN,
            preferred_element_type=acc_dtype)

    if "kernel_q" in layer:              # int8 path
        if act_scales is not None and cid in act_scales:
            s_x = act_scales[cid]        # static python float -> constant
        else:
            # dynamic PER-EXAMPLE scales: each example quantizes against
            # its own absmax, so a prediction never depends on its
            # batch-mates or on padding rows (batch-composition-
            # independent serving results), and ranges are tighter than
            # one whole-batch scale
            s_x = jnp.maximum(
                jnp.max(jnp.abs(x), axis=(1, 2, 3), keepdims=True),
                1e-6) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                      -127, 127).astype(jnp.int8)
        acc = matmul_or_conv(xq, layer["kernel_q"], jnp.int32)
        y = acc.astype(jnp.float32) * (s_x * layer["scale"]) + layer["bias"]
    else:
        y = matmul_or_conv(x.astype(dtype), layer["kernel"].astype(dtype),
                           jnp.float32)
        y = y * layer["scale"] + layer["bias"]
    return y.astype(dtype)


def folded_forward(folded, head, images, *, backbone: str = "resnet_v1_101",
                   pooling: str = "attention", act_scales: dict | None = None,
                   capture: dict | None = None, dtype: Any = jnp.bfloat16,
                   pose_head=None, dot_1x1: bool = False):
    """Full serving forward: images -> folded backbone -> head -> outputs.

    ``folded`` is the output of :func:`fold_backbone` (float path) or
    :func:`quantize_folded` (int8 path — detected per-layer).  ``head`` is
    ``variables["params"]["head"]``.  ``act_scales`` maps conv path ids to
    static activation scales (from :func:`calibrate_act_scales`); without
    it the int8 path quantizes activations dynamically (per-example absmax).
    Jit with backbone/pooling/act_scales closed over (they are static).
    """
    # video clips (config.clip_frames / ActionModel's 5-D path): frames
    # fold into the conv batch, and the pooling below spans all T*h*w
    # positions after the un-fold — identical semantics to the live
    # clip forward, so int8 video serving matches bf16's protocol
    clip_t = None
    if images.ndim == 5:
        if pose_head is not None:
            raise ValueError("pose_head is per-image; no clip support")
        b0, clip_t = images.shape[:2]
        images = images.reshape((b0 * clip_t,) + images.shape[2:])
    conv = functools.partial(_conv, act_scales=act_scales, capture=capture,
                             dtype=dtype, dot_1x1=dot_1x1)
    x = conv(images.astype(dtype), folded["conv1"], 7, 2, cid="conv1")
    x = jax.nn.relu(x)
    x = lax.reduce_window(x, jnp.asarray(-jnp.inf, x.dtype), lax.max,
                          (1, 3, 3, 1), (1, 2, 2, 1), "SAME")
    for b, num_units in enumerate(_stage_sizes(backbone), start=1):
        block_stride = _STAGE_STRIDES[b - 1]
        for u in range(1, num_units + 1):
            key = f"block{b}/unit_{u}"
            unit = folded[key]
            stride = block_stride if u == num_units else 1
            if "shortcut" in unit:
                shortcut = conv(x, unit["shortcut"], 1, stride,
                                cid=f"{key}/shortcut")
            else:
                shortcut = x if stride == 1 else x[:, ::stride, ::stride, :]
            r = jax.nn.relu(conv(x, unit["conv1"], 1, 1, cid=f"{key}/conv1"))
            r = jax.nn.relu(conv(r, unit["conv2"], 3, stride,
                                 cid=f"{key}/conv2"))
            r = conv(r, unit["conv3"], 1, 1, cid=f"{key}/conv3")
            x = jax.nn.relu(shortcut + r)

    feats = x.astype(jnp.float32)
    if clip_t is not None:
        bt, fh, fw, ff = feats.shape
        feats = feats.reshape(bt // clip_t, clip_t * fh, fw, ff)
    bsz, h, w, f = feats.shape
    out = {"features": feats}
    if pooling == "avg":
        pooled = jnp.mean(feats, axis=(1, 2))
        out["logits"] = pooled @ head["logits"]["kernel"] + \
            head["logits"]["bias"]
    else:
        out["logits"] = ap_ops.attentional_pool(
            feats.reshape(bsz, h * w, f), head["attn_w"], head["attn_b"],
            head["sal_w"], head["sal_b"])
    if pose_head is not None:
        k = pose_head["pose_conv"]
        out["pose_heatmaps"] = lax.conv_general_dilated(
            feats, k["kernel"], (1, 1), "SAME",
            dimension_numbers=_DN) + k["bias"]
    return out


def calibrate_act_scales(folded, head, batches, *,
                         backbone: str = "resnet_v1_101",
                         pooling: str = "attention",
                         margin: float = 1.0) -> dict:
    """Run the FLOAT folded forward over calibration batches, recording each
    conv input's absmax; returns {conv_id: static int8 activation scale}.

    Runs eagerly (capture needs concrete values) — calibration is a small
    offline pass (a few batches suffice for post-ReLU ResNet activations).
    """
    capture: dict = {}
    for images in batches:
        folded_forward(folded, head, jnp.asarray(images), backbone=backbone,
                       pooling=pooling, capture=capture, dtype=jnp.float32)
    return {cid: float(np.float32(amax)) / 127.0 * margin
            for cid, amax in capture.items()}


def make_int8_forward(variables, *, backbone: str = "resnet_v1_101",
                      pooling: str = "attention", calibration_batches=None,
                      dtype: Any = jnp.bfloat16):
    """Convenience: fold + quantize + (optionally) calibrate, return a
    jitted ``fn(images) -> outputs dict`` for serving."""
    folded = fold_backbone(variables, backbone)
    head = variables["params"]["head"]
    pose = variables["params"].get("pose_head")
    act_scales = None
    if calibration_batches is not None:
        act_scales = calibrate_act_scales(
            folded, head, calibration_batches, backbone=backbone,
            pooling=pooling)
    qfolded = quantize_folded(folded)

    @jax.jit
    def fwd(images):
        return folded_forward(qfolded, head, images, backbone=backbone,
                              pooling=pooling, act_scales=act_scales,
                              dtype=dtype, pose_head=pose)
    return fwd
