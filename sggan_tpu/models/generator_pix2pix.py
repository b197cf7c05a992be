"""pix2pix (TF-tutorial) U-Net generator — capability parity with
``generator_pix2pix`` (module.py:48-95), resolution-parametric.

Structure at 128x128 (the reference's fixed size): 7 downsample blocks
(conv4 s2 SAME, no bias, BN except the first, LeakyReLU; filters
[64,128,256,512,512,512,512]) to 1x1, then — because the reference zips 7
upsample blocks against only 6 retained skips (module.py:86-91, zip
truncates) — 6 upsample blocks (convT4 s2 SAME, no bias, BN, dropout 0.5
on the first three, ReLU; filters [512,512,512,512,256,128] = the explicit
up_stack at module.py:61-69 minus its truncated last entry) with CONCAT
skips, and a final convT4 s2 seeing 128+64=192 input channels ->
output_nc, tanh.  All kernels RandomNormal(0, 0.02) (module.py:15,30,71).

Batch-norm state (moving stats) is threaded functionally: ``apply`` returns
``(y, new_state)``.  The reference never updates these stats (its Keras
models are never called with training=True), which `train=False` reproduces.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import (batch_norm, batch_norm_init, conv2d, conv2d_init,
                   conv2d_transpose, conv2d_transpose_init, dropout,
                   leaky_relu, normal_init, relu, tanh)

DROP_RATE = 0.5
_INIT = normal_init(0.02)


def _plan(image_size: int, ngf: int) -> Tuple[list, list]:
    """Channel plans. At 128 reproduces module.py:51-69 exactly."""
    n_down = int(math.log2(image_size))  # down to 1x1
    down = []
    for i in range(n_down):
        down.append(min(ngf * (2 ** i), ngf * 8))
    # reference: up_stack mirrors the full down stack (module.py:61-69 is
    # [8,8,8,8,4,2,1]*ngf capped at 8*ngf = reversed(down)), but zip with
    # the n_down-1 retained skips truncates the LAST entry -> n_down-1
    # upsample blocks actually run, with filters reversed(down)[:-1].
    up = list(reversed(down))[: n_down - 1]
    return down, up


def init(key, ngf: int = 64, input_nc: int = 3, output_nc: int = 3,
         image_size: int = 128, dtype=jnp.float32):
    down, up = _plan(image_size, ngf)
    keys = iter(jax.random.split(key, 2 * len(down) + 2))
    p, state = {}, {}
    cin = input_nc
    for i, c in enumerate(down):
        p[f"down{i}"] = conv2d_init(next(keys), 4, 4, cin, c, use_bias=False,
                                    kernel_init=_INIT, dtype=dtype)
        if i > 0:
            bn = batch_norm_init(c, dtype)
            p[f"down{i}_bn"] = {"gamma": bn["gamma"], "beta": bn["beta"]}
            state[f"down{i}_bn"] = {"moving_mean": bn["moving_mean"],
                                    "moving_var": bn["moving_var"]}
        cin = c
    skip_chs = list(reversed(down[:-1]))  # concat partners, per up block
    for i, c in enumerate(up):
        p[f"up{i}"] = conv2d_transpose_init(next(keys), 4, 4, cin, c,
                                            use_bias=False, kernel_init=_INIT,
                                            dtype=dtype)
        bn = batch_norm_init(c, dtype)
        p[f"up{i}_bn"] = {"gamma": bn["gamma"], "beta": bn["beta"]}
        state[f"up{i}_bn"] = {"moving_mean": bn["moving_mean"],
                              "moving_var": bn["moving_var"]}
        cin = c + skip_chs[i]  # concat skip (192 into `last` at 128x128)
    p["last"] = conv2d_transpose_init(next(keys), 4, 4, cin, output_nc,
                                      kernel_init=_INIT, dtype=dtype)
    return p, state


def _bn(p, s, x, train: bool):
    merged = {**p, **s}
    y, new = batch_norm(merged, x, training=train)
    return y, {"moving_mean": new["moving_mean"],
               "moving_var": new["moving_var"]}


def apply(params, state, x, compute_dtype=None, rng=None,
          deterministic=True, train=False, ngf: int = 64):
    cd = compute_dtype or x.dtype
    down, up = _plan(x.shape[1], ngf)
    new_state = {}
    y = x.astype(cd)

    skips = []
    for i in range(len(down)):
        y = conv2d(params[f"down{i}"], y, 2, "SAME", cd)
        if i > 0:
            y, new_state[f"down{i}_bn"] = _bn(params[f"down{i}_bn"],
                                              state[f"down{i}_bn"], y, train)
        y = leaky_relu(y)
        skips.append(y)

    skips = list(reversed(skips[:-1]))
    n_drop = min(3, len(up))
    drop_keys = (jax.random.split(rng, n_drop) if rng is not None
                 else [None] * n_drop)
    for i in range(len(up)):
        y = conv2d_transpose(params[f"up{i}"], y, 2, "SAME", cd)
        y, new_state[f"up{i}_bn"] = _bn(params[f"up{i}_bn"],
                                        state[f"up{i}_bn"], y, train)
        if i < 3:
            det = deterministic or drop_keys[i] is None
            y = dropout(drop_keys[i], y, DROP_RATE, deterministic=det)
        y = relu(y)
        y = jnp.concatenate([y, skips[i]], axis=-1)

    y = conv2d_transpose(params["last"], y, 2, "SAME", cd)
    return tanh(y.astype(jnp.float32)), new_state
