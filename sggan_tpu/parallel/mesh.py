"""Device-mesh construction.

The reference is single-process, single-device, eager TF with no
distributed backend at all (SURVEY §2.3).  The TPU-native scale-out path is
a `jax.sharding.Mesh` with two axes:

* ``data``  — data parallelism: batch sharded, gradient allreduce (psum)
  over ICI inside the train step (dp.py);
* ``space`` — spatial sharding of the image H dimension with halo exchange
  for conv boundaries and psum'd instance-norm moments (spatial.py),
  enabling native-resolution (2048x1024) training the reference cannot do.

On multi-host slices call `jax.distributed.initialize()` before building
the mesh; XLA schedules the collectives over ICI within a slice and DCN
across slices — there is no NCCL-style wrapper to manage.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(data: Optional[int] = None, space: int = 1,
              devices=None) -> Mesh:
    """Build a (data, space) mesh.  data=None uses all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data is None:
        if n % space:
            raise ValueError(f"{n} devices not divisible by space={space}")
        data = n // space
    if data * space > n:
        raise ValueError(f"mesh {data}x{space} > {n} devices")
    grid = devices[: data * space].reshape(data, space)
    return Mesh(grid, (DATA_AXIS, SPACE_AXIS))
