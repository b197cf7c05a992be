from .pool import PoolState, pool_init, pool_update
from .step import (TrainState, build_step_fn, make_train_step, init_state,
                   lr_schedule)

__all__ = ["PoolState", "pool_init", "pool_update", "TrainState",
           "build_step_fn", "make_train_step", "init_state", "lr_schedule"]
