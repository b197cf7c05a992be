"""pix2pix PatchGAN discriminator — capability parity with
``discriminator_pix2pix`` (module.py:97-123).

concat(input, target) -> 3 downsample blocks (conv4 s2 SAME, BN except
first, LeakyReLU) -> zero-pad 1 -> conv4 s1 VALID 512 (no bias) -> BN ->
LeakyReLU -> zero-pad 1 -> conv4 s1 VALID -> 1-channel patch logits
(30x30 at 128 input... the reference's comments say 256 input but it is
built at 128; shapes adapt).  Kernels RandomNormal(0, 0.02).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import (batch_norm, batch_norm_init, conv2d, conv2d_init,
                   leaky_relu, normal_init)

_INIT = normal_init(0.02)


def init(key, ndf: int = 64, input_nc: int = 3, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 8))
    p, state = {}, {}
    chans = [ndf, ndf * 2, ndf * 4]
    cin = input_nc * 2
    for i, c in enumerate(chans):
        p[f"down{i}"] = conv2d_init(next(keys), 4, 4, cin, c, use_bias=False,
                                    kernel_init=_INIT, dtype=dtype)
        if i > 0:
            bn = batch_norm_init(c, dtype)
            p[f"down{i}_bn"] = {"gamma": bn["gamma"], "beta": bn["beta"]}
            state[f"down{i}_bn"] = {"moving_mean": bn["moving_mean"],
                                    "moving_var": bn["moving_var"]}
        cin = c
    p["conv"] = conv2d_init(next(keys), 4, 4, cin, ndf * 8, use_bias=False,
                            kernel_init=_INIT, dtype=dtype)
    bn = batch_norm_init(ndf * 8, dtype)
    p["conv_bn"] = {"gamma": bn["gamma"], "beta": bn["beta"]}
    state["conv_bn"] = {"moving_mean": bn["moving_mean"],
                        "moving_var": bn["moving_var"]}
    p["last"] = conv2d_init(next(keys), 4, 4, ndf * 8, 1, kernel_init=_INIT,
                            dtype=dtype)
    return p, state


def _bn(p, s, x, train):
    y, new = batch_norm({**p, **s}, x, training=train)
    return y, {"moving_mean": new["moving_mean"],
               "moving_var": new["moving_var"]}


def _zero_pad(x):
    return jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])


def apply(params, state, inp, tar, compute_dtype=None, train=False):
    """Returns (patch_logits, new_state)."""
    cd = compute_dtype or inp.dtype
    y = jnp.concatenate([inp.astype(cd), tar.astype(cd)], axis=-1)
    new_state = {}
    for i in range(3):
        y = conv2d(params[f"down{i}"], y, 2, "SAME", cd)
        if i > 0:
            y, new_state[f"down{i}_bn"] = _bn(params[f"down{i}_bn"],
                                              state[f"down{i}_bn"], y, train)
        y = leaky_relu(y)
    y = _zero_pad(y)
    y = conv2d(params["conv"], y, 1, "VALID", cd)
    y, new_state["conv_bn"] = _bn(params["conv_bn"], state["conv_bn"], y, train)
    y = leaky_relu(y)
    y = _zero_pad(y)
    y = conv2d(params["last"], y, 1, "VALID", cd)
    return y.astype(jnp.float32), new_state
