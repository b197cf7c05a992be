"""AOT export of the generator for serving.

`jax.export` serializes the jitted forward to a stable artifact
(StableHLO) that reloads and executes without retracing Python — the
deployment path for the translation service (serve.py).  No reference
counterpart (its inference is the eager test loop, model.py:535-567).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport


def export_generator(gen_apply, params, image_hw, batch_size: int = 1,
                     compute_dtype=jnp.bfloat16) -> bytes:
    """Serialize `gen_apply(params, x)` closed over the params for a fixed
    input shape.  Returns the serialized artifact bytes."""
    x_spec = jax.ShapeDtypeStruct((batch_size, *image_hw, 3), jnp.float32)

    def fwd(x):
        return gen_apply(params, x, compute_dtype=compute_dtype)

    exported = jexport.export(jax.jit(fwd))(x_spec)
    return exported.serialize()


def export_fn(fn, *arg_specs) -> bytes:
    """Serialize an arbitrary jittable `fn(*args)` for the given
    ShapeDtypeStruct arg specs (used by serve.py to bake the full
    test-time input convention into the deployment artifact)."""
    return jexport.export(jax.jit(fn))(*arg_specs).serialize()


def load_generator(blob: bytes):
    """Deserialize an exported generator; returns a callable(x)."""
    exported = jexport.deserialize(blob)
    return lambda x: exported.call(x)


def save(path: str, blob: bytes):
    with open(path, "wb") as f:
        f.write(blob)


def load(path: str):
    with open(path, "rb") as f:
        return load_generator(f.read())
