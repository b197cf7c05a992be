"""Import TF2/Keras weights into sggan_tpu param trees.

The pixel-parity target (<1e-3 mean abs diff vs the TF2 generator,
BASELINE.md) requires loading the reference's trained weights.  TensorFlow
is not a dependency of this framework, so the interchange format is a
plain ``.npz`` holding the flat list from ``keras_model.get_weights()``
saved as ``w0, w1, ...`` (export one-liner, run wherever TF is installed):

    np.savez("gen.npz", **{f"w{i}": w
                           for i, w in enumerate(model.get_weights())})

Keras returns weights in layer-creation order, which matches the builder
functions' construction order (module.py:125-318); the maps below list
(path, kind) per weight in that order.  Kinds: conv -> HWIO kernel (used
as-is), convT -> (kh, kw, out, in) kernel (used as-is — our op implements
the same gradient semantics, layers.py), bias/gamma/beta -> 1-D.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import jax.numpy as jnp


def _conv(path: str, bias: bool = True) -> List[Tuple[str, str]]:
    w = [(path + "/w", "kernel")]
    return w + [(path + "/b", "bias")] if bias else w


def _in(path: str) -> List[Tuple[str, str]]:
    return [(path + "/gamma", "gamma"), (path + "/beta", "beta")]


def resnet_layout() -> List[Tuple[str, str]]:
    """generator_resnet weight order (module.py:219-269)."""
    out = _conv("c1") + _in("c1_in") + _conv("c2") + _in("c2_in") \
        + _conv("c3") + _in("c3_in")
    for i in range(1, 10):
        out += _conv(f"r{i}/conv1") + _in(f"r{i}/in1")
        out += _conv(f"r{i}/conv2") + _in(f"r{i}/in2")
    out += _conv("d1") + _in("d1_in") + _conv("d2") + _in("d2_in")
    out += _conv("out")
    return out


def unet_layout() -> List[Tuple[str, str]]:
    """generator_unet weight order (module.py:125-206)."""
    out: List[Tuple[str, str]] = []
    for i in range(1, 9):
        out += _conv(f"e{i}") + _in(f"e{i}_in")
    for i in range(1, 8):
        out += _conv(f"d{i}") + _in(f"d{i}_in")
    out += _conv("d8")
    return out


def discriminator_layout(n_valid: int = 3) -> List[Tuple[str, str]]:
    """Semantic discriminator weight order (module.py:272-318); n_valid is
    the VALID-chain length (3 at 128x128: h31/h32/h33)."""
    out = _conv("h0") + _conv("h1") + _in("h1_in") + _conv("h2") \
        + _in("h2_in") + _conv("h3") + _in("h3_in")
    for i in range(n_valid):
        out += _conv(f"v{i}") + _in(f"v{i}_in")
    out += _conv("h4")
    return out


_LAYOUTS = {
    "resnet": resnet_layout,
    "unet": unet_layout,
    "discriminator": discriminator_layout,
}


def load_npz_weights(path_or_file, net: str, params, **layout_kw):
    """Fill the param tree `params` (from models.*.init) with weights from
    the npz flat list.  Shapes are validated leaf by leaf."""
    data = np.load(path_or_file)
    flat = [data[f"w{i}"] for i in range(len(data.files))]
    return assign_flat_weights(flat, net, params, **layout_kw)


def load_bundle_weights(prefix: str, net: str, params, **layout_kw):
    """Load a reference ``Model.save_weights`` TensorBundle checkpoint
    (e.g. checkpoint/<ds>/gen/cp-0021.ckpt) directly — no TF, no npz
    export step (tf_bundle.py)."""
    from .tf_bundle import keras_weights
    return assign_flat_weights(keras_weights(prefix), net, params,
                               **layout_kw)


def assign_flat_weights(flat, net: str, params, **layout_kw):
    layout = _LAYOUTS[net](**layout_kw)
    if len(flat) != len(layout):
        raise ValueError(
            f"{net}: expected {len(layout)} weights, got {len(flat)}")
    new = _copy_tree(params)
    for w, (path, _) in zip(flat, layout):
        node = new
        parts = path.split("/")
        for p in parts[:-1]:
            node = node[p]
        leaf = parts[-1]
        if tuple(node[leaf].shape) != tuple(w.shape):
            raise ValueError(
                f"{path}: shape {w.shape} != expected {node[leaf].shape}")
        node[leaf] = jnp.asarray(w, dtype=node[leaf].dtype)
    return new


def _copy_tree(t):
    if isinstance(t, dict):
        return {k: _copy_tree(v) for k, v in t.items()}
    return t
