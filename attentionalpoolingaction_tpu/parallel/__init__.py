"""Mesh / sharding utilities (pjit data-parallel + optional model axis)."""

from attentionalpoolingaction_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    state_shardings,
)
from attentionalpoolingaction_tpu.parallel import multihost

__all__ = ["make_mesh", "batch_sharding", "replicated",
           "state_shardings", "multihost"]
