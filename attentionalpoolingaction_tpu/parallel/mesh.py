"""Device mesh + sharding helpers.

The reference has no parallelism beyond one GPU (SURVEY.md section 2.3); the
TPU-native framework scales with a ``jax.sharding.Mesh``:

  * ``data`` axis — batch/data parallelism (gradient psum inserted by the
    compiler; rides ICI on a pod slice).
  * optional ``model`` axis — shards the attentional-pooling head's class
    dimension (C=600 for HICO) and the 2048-dim feature axis; unnecessary at
    ResNet-101 scale but wired through for completeness.

All collective placement is left to XLA via NamedSharding annotations — no
hand-written collectives on the training path (ICI-aware by construction).
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Sequence[int] = None,
              axis_names: Sequence[str] = ("data",),
              devices: Sequence = None) -> Mesh:
    """Build a mesh over all visible devices (or an explicit ``devices``
    list, e.g. ``jax.local_devices()`` for a host-local mesh).
    ``shape=None`` puts every device on the first axis."""
    devices = list(devices) if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(
            f"mesh shape {tuple(shape)} needs {n} devices, "
            f"have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, axis_names)


def model_axis_of(mesh: Mesh) -> str | None:
    """The tensor-parallel axis name if the mesh has a non-trivial one."""
    if "model" in mesh.axis_names and mesh.shape["model"] > 1:
        return "model"
    return None


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host numpy batch onto the mesh, batch-dim sharded.

    Single-process: the batch IS the global batch — a plain sharded
    device_put.  Multi-process: the batch is this host's 1/process_count
    share, and the global array is assembled from per-process local
    shards (the mesh spans non-addressable devices, where device_put of
    host data is invalid — the standard JAX multi-host recipe)."""
    sh = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def shard_batches(iterator, mesh: Mesh, axis: str = "data"):
    """shard_batch applied to a stream — train() uses this for stateful
    (checkpointable) iterators, which bypass prefetch_to_device so their
    saved state matches the last CONSUMED batch."""
    for batch in iterator:
        yield shard_batch(batch, mesh, axis)


def state_shardings(mesh: Mesh, state, *, model_axis: str | None = None,
                    zero1_axis: str | None = None):
    """Sharding pytree for a TrainState.

    Default: everything replicated (pure data parallel).  With
    ``model_axis`` (tensor parallelism for the wide pooling head —
    SURVEY.md section 2.3 TP row): the head's class dimension (C = 600 for
    HICO) shards over the axis; XLA/GSPMD inserts the all-gather where the
    per-class logits meet the loss.  ResNet backbone params stay replicated
    (42M params — sharding them buys nothing at this scale).

    With ``zero1_axis`` (ZeRO-1 / optimizer-state sharding — SURVEY.md
    section 2.3 "optional optimizer-state sharding via pjit if ever
    needed"): each OPTIMIZER-state leaf (momentum etc.) is partitioned
    over the axis on its widest evenly-divisible dimension; params and
    batch stats stay replicated.  GSPMD then computes the update shards
    locally and all-gathers the parameter delta — the standard ZeRO-1
    dataflow, expressed entirely through shardings.  At 42M params this
    saves ~150 MB/device of momentum per extra axis-fold; it exists for
    inventory completeness and larger future heads, off by default
    (config.TrainConfig.zero1).

    Head param shapes (models/heads.py): attn_w (F, C, P), attn_b (C, P);
    the avg head's logits kernel (F, C) / bias (C,).
    """
    repl = NamedSharding(mesh, P())
    model_size = mesh.shape[model_axis] if model_axis else 1
    zero_size = mesh.shape[zero1_axis] if zero1_axis else 1
    if model_size <= 1 and zero_size <= 1:
        return jax.tree.map(lambda _: repl, state)

    def shard_dim(leaf, dim, spec, axis_size):
        # GSPMD in_shardings require even splits; replicate otherwise
        if leaf.shape[dim] % axis_size == 0:
            return NamedSharding(mesh, spec)
        return repl

    def zero1_sharding(leaf):
        if getattr(leaf, "ndim", 0) == 0:
            return repl
        # widest dimension the axis divides evenly (conv kernels: the
        # output-channel dim; biases/BN: the only dim)
        cands = [d for d in range(leaf.ndim)
                 if leaf.shape[d] % zero_size == 0]
        if not cands:
            return repl
        dim = max(cands, key=lambda d: leaf.shape[d])
        spec = [None] * leaf.ndim
        spec[dim] = zero1_axis
        return NamedSharding(mesh, P(*spec))

    def leaf_sharding(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        if model_size > 1 and "head" in keys:
            name = keys[-1]
            if name == "attn_w" and leaf.ndim == 3:     # (F, C, P)
                return shard_dim(leaf, 1, P(None, model_axis, None),
                                 model_size)
            if name == "attn_b" and leaf.ndim == 2:     # (C, P)
                return shard_dim(leaf, 0, P(model_axis, None), model_size)
            if name == "kernel" and leaf.ndim == 2:     # avg head (F, C)
                return shard_dim(leaf, 1, P(None, model_axis), model_size)
            if name == "bias" and leaf.ndim == 1:       # avg head (C,)
                return shard_dim(leaf, 0, P(model_axis), model_size)
        if zero_size > 1 and path and getattr(
                path[0], "name", None) == "opt_state":
            return zero1_sharding(leaf)
        return repl

    return jax.tree_util.tree_map_with_path(leaf_sharding, state)
