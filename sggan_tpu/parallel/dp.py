"""Data-parallel train step: shard_map over the ``data`` mesh axis with
gradient allreduce (pmean -> psum over ICI).

No reference counterpart (the reference is single-device eager,
SURVEY §2.3); semantics anchor: same train step, bigger global batch.
Parameters and optimizer states are replicated, the batch is sharded on
its leading dimension, gradients/metrics/BN stats are averaged across
shards inside the compiled step, and the image pool keeps per-shard slots
(its buffer is sharded on the slot dimension; the fill counter advances
identically on every shard so it stays replicated).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.pool import PoolState
from ..train.step import TrainState, build_step_fn
from .mesh import DATA_AXIS


def _state_spec() -> TrainState:
    return TrainState(
        gen_params=P(), gen_bn=P(), disc_params=P(), disc_bn=P(),
        g_opt=P(), d_opt=P(),
        pool=PoolState(buffer=P(DATA_AXIS), count=P()),
        step=P(), ema=P(),
    )


def make_dp_step_body(cfg, mesh: Mesh):
    """The shard_mapped but UN-jitted dp step body: (state, batch, lr,
    rng) -> (state, metrics), batch sharded over 'data'.  Composable
    inside a larger jitted program — the trainer's fused
    gather+preprocess+step dispatch and its lax.scan chunking wrap this
    body so mesh training keeps the single-dispatch pipeline."""
    if cfg.loss_mode == "cycle":
        from ..train.cycle import build_cycle_step_fn
        fn = build_cycle_step_fn(cfg, axis_name=DATA_AXIS)
    else:
        fn = build_step_fn(cfg, axis_name=DATA_AXIS)
    spec = _state_spec()
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(spec, P(DATA_AXIS), P(), P()),
        out_specs=(spec, P()),
        check_vma=False,
    )


def make_dp_train_step(cfg, mesh: Mesh, donate: Optional[bool] = None):
    """(state, batch, lr, rng) -> (state, metrics), batch sharded over
    'data'.  Global batch size must divide by the data axis size."""
    mapped = make_dp_step_body(cfg, mesh)
    donate = cfg.donate if donate is None else donate
    return jax.jit(mapped, donate_argnums=(0,) if donate else ())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch sharded over the data axis.

    Single-controller: a plain sharded device_put.  Multi-process: each
    process holds only its local slice of the global batch (the loader's
    per-process file sharding), so the global array is assembled with
    `make_array_from_process_local_data` — the per-process shards become
    the `data`-axis shards without any cross-host transfer."""
    sh = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() > 1:
        import numpy as np
        return {k: jax.make_array_from_process_local_data(
            sh, np.asarray(v)) for k, v in batch.items()}
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    """Replicate a pytree across the mesh (params/opt states), except the
    pool buffer which is sharded on its slot dimension."""
    rep = NamedSharding(mesh, P())
    placed = jax.device_put(tree, rep)
    if isinstance(tree, TrainState):
        buf = jax.device_put(tree.pool.buffer,
                             NamedSharding(mesh, P(DATA_AXIS)))
        placed = placed._replace(pool=placed.pool._replace(buffer=buf))
    return placed
