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

An "item" may be a single array or a PYTREE of arrays sharing the same
leading batch dim — the whole entry is stored/swapped atomically, so e.g.
(fake, mask) pairs stay together and a historical fake is judged against
the mask it was generated under, not the current batch's.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class PoolState(NamedTuple):
    buffer: Any           # pytree of (max_size, *item_shape) arrays
    count: jnp.ndarray    # scalar int32


def _is_shape(x) -> bool:
    return isinstance(x, tuple) and all(isinstance(d, int) for d in x)


def pool_init(max_size: int, item_shape, dtype=jnp.float32) -> PoolState:
    """item_shape: a shape tuple, or a pytree of shape tuples (the pool
    then stores whole pytree entries atomically)."""
    n = max(max_size, 1)
    if _is_shape(item_shape):
        buf = jnp.zeros((n, *item_shape), dtype)
    else:
        buf = jax.tree.map(lambda s: jnp.zeros((n, *s), dtype),
                           item_shape, is_leaf=_is_shape)
    return PoolState(buffer=buf, count=jnp.zeros((), jnp.int32))


def pool_update(state: PoolState, key, items) -> tuple:
    """items: pytree of (B, *item_shape). Returns (new_state, out_items),
    both in the BUFFER's dtype (items are cast on entry).  The train
    steps size the buffer in the compute dtype: every pool consumer is a
    discriminator forward that casts to the compute dtype anyway, so
    under bf16 training a bf16 buffer is bit-exact vs f32 storage while
    halving the pool's HBM footprint (1.5 GB -> 0.75 GB at native
    2048x1024 with max_size=50)."""
    max_size = jax.tree.leaves(state.buffer)[0].shape[0]
    b = jax.tree.leaves(items)[0].shape[0]
    tmap = jax.tree.map
    items = tmap(lambda it, bf: it.astype(bf.dtype), items, state.buffer)

    def body(i, carry):
        buf, count, out = carry
        item = tmap(lambda a: lax.dynamic_index_in_dim(a, i, keepdims=False),
                    items)
        k_use, k_idx = jax.random.split(jax.random.fold_in(key, i))
        filling = count < max_size
        # index to write: append position while filling, else random slot
        rand_idx = jax.random.randint(k_idx, (), 0, max_size)
        use_hist = jnp.logical_and(jnp.logical_not(filling),
                                   jax.random.uniform(k_use) > 0.5)
        write_idx = jnp.where(filling, count, rand_idx)
        old = tmap(lambda a: lax.dynamic_index_in_dim(a, write_idx,
                                                      keepdims=False), buf)
        out_item = tmap(lambda o, it: jnp.where(use_hist, o, it), old, item)
        do_write = jnp.logical_or(filling, use_hist)
        new_entry = tmap(lambda it, o: jnp.where(do_write, it, o), item, old)
        buf = tmap(lambda a, e: lax.dynamic_update_index_in_dim(
            a, e, write_idx, 0), buf, new_entry)
        count = jnp.minimum(count + filling.astype(jnp.int32), max_size)
        out = tmap(lambda a, oi: lax.dynamic_update_index_in_dim(
            a, oi, i, 0), out, out_item)
        return buf, count, out

    buf, count, out = lax.fori_loop(
        0, b, body,
        (state.buffer, state.count, tmap(jnp.zeros_like, items)))
    return PoolState(buf, count), out
