"""Checkpointing: Orbax save/restore for TrainState, plus the TF-slim
checkpoint converter (slim ``resnet_v1_101/...`` variable names -> Flax
pytree) for ImageNet init and reference-parity logits.

Replaces tf.train.Saver + slim's init-from-checkpoint with scope exclusions
(SURVEY.md sections 2.2 table and 5 "Checkpoint/resume").
"""

from __future__ import annotations

import logging
import re
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

log = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Orbax save/restore
# ---------------------------------------------------------------------------

def make_manager(workdir, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        workdir,
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True),
    )


def save(manager: ocp.CheckpointManager, state):
    manager.save(int(state.step), args=ocp.args.StandardSave(state))


def restore(manager: ocp.CheckpointManager, abstract_state, step=None):
    step = step if step is not None else manager.latest_step()
    if step is None:
        return None
    return manager.restore(step,
                           args=ocp.args.StandardRestore(abstract_state))


# ---------------------------------------------------------------------------
# TF-slim checkpoint conversion
# ---------------------------------------------------------------------------

_SLIM_BN = {"gamma": "scale", "beta": "bias",
            "moving_mean": "mean", "moving_variance": "var"}


def _map_slim_name(name: str, model_scope: str):
    """Map one slim variable name to (collection, flax_path, transpose).

    Slim layout (SURVEY.md section 2.2 "tf.train.Saver checkpoint format"):
      resnet_v1_101/conv1/weights                         (7,7,3,64)
      resnet_v1_101/conv1/BatchNorm/{gamma,beta,moving_*}
      resnet_v1_101/block1/unit_1/bottleneck_v1/conv1/weights
      resnet_v1_101/block1/unit_1/bottleneck_v1/shortcut/weights
      resnet_v1_101/logits/{weights,biases}
    Flax layout (models/resnet.py):
      resnet/conv1/kernel, resnet/conv1_bn/{scale,bias}
      batch_stats: resnet/conv1_bn/{mean,var}
      resnet/block1/unit_1/{conv1,conv1_bn,shortcut,shortcut_bn}/...
    """
    name = name.removeprefix(model_scope + "/")
    parts = name.split("/")
    # strip slim's bottleneck_v1 scope level
    parts = [p for p in parts if p != "bottleneck_v1"]
    leaf = parts[-1]
    if leaf in ("weights", "biases"):
        flax_leaf = "kernel" if leaf == "weights" else "bias"
        path = parts[:-1] + [flax_leaf]
        return "params", ["resnet"] + path, False
    if parts[-2] == "BatchNorm" and leaf in _SLIM_BN:
        conv_name = parts[-3]
        coll = ("batch_stats" if leaf.startswith("moving_") else "params")
        path = parts[:-3] + [conv_name + "_bn", _SLIM_BN[leaf]]
        return coll, ["resnet"] + path, False
    return None


def convert_slim_checkpoint(ckpt_path: str, *,
                            model_scope: str = "resnet_v1_101"):
    """Read a TF1-slim ResNet checkpoint and return
    {"params": ..., "batch_stats": ...} nested dicts matching
    models.resnet.ResNetV1 (under a top-level "resnet" module).

    Uses tf.train.load_checkpoint (pure reading — no TF graph).  Slim conv
    kernels are HWIO like Flax, so no transposition is needed; dense/1x1
    logits kernels (f, C) map directly.
    """
    import tensorflow as tf

    reader = tf.train.load_checkpoint(ckpt_path)
    shapes = reader.get_variable_to_shape_map()
    out: dict[str, Any] = {"params": {}, "batch_stats": {}}
    skipped = []
    for var_name in sorted(shapes):
        clean = var_name.split(":")[0]
        if any(s in clean for s in ("Momentum", "global_step", "ExponentialMovingAverage",
                                    "RMSProp", "Adam", "beta1_power", "beta2_power")):
            continue
        mapped = _map_slim_name(clean, model_scope)
        if mapped is None:
            skipped.append(clean)
            continue
        coll, path, _ = mapped
        value = np.asarray(reader.get_tensor(clean))
        node = out[coll]
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = value
    if skipped:
        log.info("slim convert: skipped %d vars (e.g. %s)",
                 len(skipped), skipped[:3])
    return out


def merge_pretrained(variables, converted, *, exclude: tuple[str, ...] = ()):
    """Overlay converted slim weights onto freshly-initialized variables,
    leaving new-head scopes untouched (the reference's exclusion-list
    fine-tune init, SURVEY.md section 3.1 step 8).

    ``exclude``: path-prefix regexes (e.g. ``("head", "pose_head")``).
    Raises on shape mismatch for any overlaid leaf.
    """
    flat_conv = _flatten(converted)
    out = jax.tree_util.tree_map(lambda x: x, variables)  # copy

    applied = 0
    for coll in ("params", "batch_stats"):
        if coll not in variables or coll not in converted:
            continue
        flat_var = _flatten({coll: out[coll]})
        for path, val in flat_conv.items():
            if not path.startswith(coll + "/"):
                continue
            rel = path[len(coll) + 1:]
            if any(re.match(e, rel) for e in exclude):
                continue
            if path not in flat_var:
                raise KeyError(f"converted var {path} not in model")
            cur = flat_var[path]
            if tuple(cur.shape) != tuple(np.asarray(val).shape):
                raise ValueError(
                    f"shape mismatch at {path}: model {cur.shape} "
                    f"vs checkpoint {np.asarray(val).shape}")
            _set(out, path, np.asarray(val).astype(np.asarray(cur).dtype))
            applied += 1
    log.info("merged %d pretrained vars", applied)
    return out


def _flatten(tree, prefix=""):
    flat = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(_flatten(v, p))
        else:
            flat[p] = v
    return flat


def _set(tree, path, value):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node[k]
    node[keys[-1]] = value
