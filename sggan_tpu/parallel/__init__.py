from .mesh import make_mesh, DATA_AXIS, SPACE_AXIS, WSPACE_AXIS
from .dp import make_dp_train_step, shard_batch, replicate
from . import spatial

__all__ = ["make_mesh", "DATA_AXIS", "SPACE_AXIS", "WSPACE_AXIS",
           "make_dp_train_step", "shard_batch", "replicate", "spatial"]
