"""Device-mesh construction.

The reference is single-process, single-device, eager TF with no
distributed backend at all (SURVEY §2.3).  The TPU-native scale-out path is
a `jax.sharding.Mesh` with two axes:

* ``data``  — data parallelism: batch sharded, gradient allreduce (psum)
  over ICI inside the train step (dp.py);
* ``space`` — spatial sharding of the image H dimension with halo exchange
  for conv boundaries and psum'd instance-norm moments (spatial.py),
  enabling native-resolution (2048x1024) training the reference cannot do;
* ``wspace`` — optional second spatial axis sharding the image W dimension
  (a 2-D H x W shard grid for very wide panoramas); halo columns travel the
  same way and instance-norm moments psum over both spatial axes.

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
WSPACE_AXIS = "wspace"


def make_mesh(data: Optional[int] = None, space: int = 1,
              devices=None, wspace: int = 1) -> Mesh:
    """Build a (data, space[, wspace]) mesh.  data=None uses all remaining
    devices.  The wspace axis only appears when wspace > 1 so existing
    2-axis PartitionSpecs keep working unchanged."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    sp = space * wspace
    if data is None:
        if n % sp:
            raise ValueError(
                f"{n} devices not divisible by space={space}*wspace={wspace}")
        data = n // sp
    if data * sp > n:
        raise ValueError(f"mesh {data}x{space}x{wspace} > {n} devices")
    if wspace > 1:
        grid = devices[: data * sp].reshape(data, space, wspace)
        return Mesh(grid, (DATA_AXIS, SPACE_AXIS, WSPACE_AXIS))
    grid = devices[: data * sp].reshape(data, space)
    return Mesh(grid, (DATA_AXIS, SPACE_AXIS))
