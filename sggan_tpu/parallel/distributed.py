"""Multi-host initialization.

There is no NCCL/MPI-style backend to wrap on TPU (SURVEY §2.3): XLA
schedules all collectives over ICI within a slice and DCN across slices.
The framework's only multi-host responsibilities are (a) calling
`jax.distributed.initialize` once per process and (b) building a mesh
whose `data` axis spans hosts (DCN-friendly: gradient allreduce is
hierarchical automatically) while `space` stays within a host's chips so
halo exchange rides ICI.
"""

from __future__ import annotations

from typing import Optional

import jax

from .mesh import make_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Idempotent jax.distributed.initialize.  With no arguments, JAX
    auto-detects the TPU pod environment (GKE/GCE metadata)."""
    try:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise


def global_mesh(space: int = 1):
    """Mesh over every chip in the job: `data` spans hosts (outer, DCN ok),
    `space` stays chip-local groups (inner, ICI)."""
    n = jax.device_count()
    if n % space:
        raise ValueError(f"{n} devices not divisible by space={space}")
    return make_mesh(data=n // space, space=space, devices=jax.devices())


def is_coordinator() -> bool:
    return jax.process_index() == 0
