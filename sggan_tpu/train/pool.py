"""Functional, jittable image pool.

The reference carries a CycleGAN 50-image history pool (utils.py:27-53)
that is instantiated (model.py:79) but never called; its train step instead
accidentally accumulates fake batches by concatenation up to 10 and resets
(model.py:175-179) — shape-dynamic and unjittable.  We realize the
*intended* pool semantics as a fixed-shape functional transform:

    state: (buffer [max_size, ...], count)
    update(state, key, items[B, ...]) -> (state', out[B, ...])

Per item: while the pool is filling, store and pass the item through;
once full, with p=0.5 return a uniformly random historical entry and
replace it with the item, else pass the item through (utils.py:36-53,
rationalized to the canonical CycleGAN rule).  max_size=0 disables the
pool (utils.py:34-35).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class PoolState(NamedTuple):
    buffer: jnp.ndarray   # (max_size, *item_shape)
    count: jnp.ndarray    # scalar int32


def pool_init(max_size: int, item_shape, dtype=jnp.float32) -> PoolState:
    return PoolState(
        buffer=jnp.zeros((max(max_size, 1), *item_shape), dtype),
        count=jnp.zeros((), jnp.int32),
    )


def pool_update(state: PoolState, key, items) -> tuple:
    """items: (B, *item_shape). Returns (new_state, out_items (B, ...))."""
    max_size = state.buffer.shape[0]
    b = items.shape[0]

    def body(i, carry):
        buf, count, out = carry
        item = lax.dynamic_index_in_dim(items, i, keepdims=False)
        k_use, k_idx = jax.random.split(jax.random.fold_in(key, i))
        filling = count < max_size
        # index to write: append position while filling, else random slot
        rand_idx = jax.random.randint(k_idx, (), 0, max_size)
        use_hist = jnp.logical_and(jnp.logical_not(filling),
                                   jax.random.uniform(k_use) > 0.5)
        write_idx = jnp.where(filling, count, rand_idx)
        old = lax.dynamic_index_in_dim(buf, write_idx, keepdims=False)
        out_item = jnp.where(use_hist, old, item)
        do_write = jnp.logical_or(filling, use_hist)
        new_entry = jnp.where(do_write, item, old)
        buf = lax.dynamic_update_index_in_dim(buf, new_entry, write_idx, 0)
        count = jnp.minimum(count + filling.astype(jnp.int32), max_size)
        out = lax.dynamic_update_index_in_dim(out, out_item, i, 0)
        return buf, count, out

    buf, count, out = lax.fori_loop(
        0, b, body, (state.buffer, state.count, jnp.zeros_like(items)))
    return PoolState(buf, count), out
