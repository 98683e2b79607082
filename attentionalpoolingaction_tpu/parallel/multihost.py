"""Multi-host (multi-process) runtime setup.

The reference is single-machine (SURVEY.md section 2.4); the TPU-native
framework scales across hosts with the standard JAX multi-process runtime:
every host runs the same program, `jax.distributed.initialize` wires the
coordination service, pjit spans the global mesh, collectives ride ICI
(intra-slice) / DCN (cross-slice) as placed by XLA.

Call :func:`setup` once at program start (the CLIs do this behind
``--multiprocess``).  On single-host runs it is a no-op, so the same entry
points work everywhere.  Per-host input sharding is already keyed off
``jax.process_index()`` in both pipelines.
"""

from __future__ import annotations

import logging

import jax

log = logging.getLogger(__name__)


def setup(coordinator_address: str | None = None,
          num_processes: int | None = None,
          process_id: int | None = None) -> None:
    """Initialize the JAX distributed runtime when running multi-process.

    With no arguments, relies on the TPU environment's auto-detection
    (GCE metadata / megascale env vars); explicit arguments support
    manual bring-up.  No-op if already initialized or single-process.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except (RuntimeError, ValueError) as e:  # already initialized / 1-proc
        log.info("jax.distributed.initialize skipped: %s", e)
    log.info("process %d/%d, %d local / %d global devices",
             jax.process_index(), jax.process_count(),
             jax.local_device_count(), jax.device_count())


def assert_same_across_hosts(value: int, name: str = "value") -> None:
    """Cheap cross-host sanity check: all processes must agree on ``value``
    (e.g. global batch size); sums each host's contribution over a global
    1-axis mesh (jit + NamedSharding, like every other collective in the
    codebase — no legacy pmap)."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if jax.process_count() == 1:
        return
    mesh = Mesh(np.asarray(jax.devices()), ("i",))
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("i")),
        np.full((jax.local_device_count(),), value, np.float32))
    total = jax.jit(lambda x: x.sum(),
                    out_shardings=NamedSharding(mesh, P()))(arr)
    expected = value * jax.device_count()
    if float(total) != expected:
        raise ValueError(
            f"{name} differs across hosts: sum {float(total)} != "
            f"{expected}")


def allgather_host_arrays(arrays: dict) -> dict:
    """Concatenate per-host numpy arrays (variable length along axis 0)
    across all processes; the multi-host sharded-eval combiner (VERDICT r2
    next #4: each host evaluates 1/process_count of the split, results are
    gathered so every host computes identical metrics).

    COLLECTIVE: every process must call with the same keys and dtypes.
    Per-host row counts may differ (shard remainders): rows are padded to
    the max count before the gather, so callers MUST carry a ``mask`` key
    (1.0 = real row) — padding rows arrive with mask 0 and drop out in the
    caller's mask filter.  Single-process: identity."""
    if jax.process_count() == 1:
        return arrays
    import numpy as np
    from jax.experimental import multihost_utils

    n = int(next(iter(arrays.values())).shape[0])
    counts = np.asarray(multihost_utils.process_allgather(
        np.asarray([n]), tiled=True))
    m = int(counts.max())
    out = {}
    for k in sorted(arrays):      # deterministic collective order
        v = np.asarray(arrays[k])
        if m > n:
            v = np.pad(v, [(0, m - n)] + [(0, 0)] * (v.ndim - 1))
        out[k] = np.asarray(multihost_utils.process_allgather(
            v, tiled=True))
    return out


def broadcast_step(step: int | None) -> int | None:
    """Host-0's checkpoint step wins everywhere (``None`` encoded as -1).

    --follow polls the checkpoint dir on every host; filesystem races mean
    hosts can see different "latest" steps, and the sharded eval's gather is
    a collective — mixed steps would pair up silently.  Agreeing on host 0's
    view before evaluating keeps every process on the same checkpoint.
    Single-process: identity."""
    if jax.process_count() == 1:
        return step
    import numpy as np
    from jax.experimental import multihost_utils

    v = multihost_utils.broadcast_one_to_all(
        np.asarray([-1 if step is None else int(step)], np.int64))
    s = int(v[0])
    return None if s < 0 else s


def allreduce_flag(flag: bool) -> bool:
    """Cross-host OR of a python bool (max over a global mesh).  Blocking
    variant of :class:`FlagAllReduce` for one-shot checks."""
    r = FlagAllReduce()
    return r.read(r.dispatch(flag))


class FlagAllReduce:
    """Non-blocking cross-host OR of a per-host python bool.

    Used to agree on preemption stop across hosts: async step dispatch
    lets the python loops drift a step apart, so each host's local
    SIGTERM flag must be combined collectively before anyone checkpoints,
    or hosts would enter the collective Orbax save at different steps and
    deadlock the pod (ADVICE r2 train.py:446).

    Protocol: every host calls ``dispatch(local_flag)`` at every step (the
    collective enqueues asynchronously, preserving the step pipeline) and
    reads the PREVIOUS step's result with ``read`` — a one-step-delayed
    but host-consistent value, so every process observes the stop at the
    same step number.  Single-process: dispatch/read degrade to the plain
    flag with no device work."""

    def __init__(self):
        self._single = jax.process_count() == 1
        if not self._single:
            import numpy as np
            from jax.sharding import Mesh, NamedSharding
            from jax.sharding import PartitionSpec as P

            self._mesh = Mesh(np.asarray(jax.devices()), ("i",))
            self._in = NamedSharding(self._mesh, P("i"))
            self._sum = jax.jit(
                lambda x: x.max(),
                out_shardings=NamedSharding(self._mesh, P()))

    def dispatch(self, flag: bool):
        if self._single:
            return flag
        import numpy as np

        arr = jax.make_array_from_process_local_data(
            self._in, np.full((jax.local_device_count(),), float(flag),
                              np.float32))
        return self._sum(arr)

    def read(self, handle) -> bool:
        if self._single:
            return bool(handle)
        return bool(float(handle) > 0)
