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
    (e.g. global batch size); uses a psum over a global mesh."""
    import jax.numpy as jnp

    if jax.process_count() == 1:
        return
    total = jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(
        jnp.ones((jax.local_device_count(),)) * value)
    expected = value * jax.device_count()
    if float(total[0]) != expected:
        raise ValueError(
            f"{name} differs across hosts: psum {float(total[0])} != "
            f"{expected}")
