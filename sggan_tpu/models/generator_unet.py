"""The reference's default generator — capability parity with
``generator_unet`` (module.py:125-206), resolution-parametric instead of the
hard-coded 128x128 input (module.py:135).

Faithful structural quirks (kept deliberately, they define the net's
behaviour):
* every conv/conv-transpose is 3x3 stride 1 "same" — there is NO true
  down/upsampling; "U-Net" refers only to the additive skip pattern;
* skips are ADDITIVE (tf.keras.layers.add, module.py:172-199), not concat;
* activations: LeakyReLU after every encoder IN, relu only after e8 and
  after the d3/d7 adds; d1/d2/d4/d5/d6 have no post-add activation;
* dropout 0.5 sits between conv-transpose and IN on d1-d3
  (module.py:170-181).  The reference never actually enables it because
  Keras models are called without training=True; `deterministic` exposes
  the choice (Config.dropout_mode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import (conv2d, conv2d_init, conv2d_transpose,
                   conv2d_transpose_init, dropout, instance_norm,
                   instance_norm_init, leaky_relu, relu, tanh)

DROP_RATE = 0.5


def _enc_channels(ngf: int):
    return [ngf, ngf * 2, ngf * 4, ngf * 8, ngf * 8, ngf * 8, ngf * 8, ngf * 8]


def _dec_channels(ngf: int):
    return [ngf * 8, ngf * 8, ngf * 8, ngf * 8, ngf * 4, ngf * 2, ngf]


def init(key, ngf: int = 64, input_nc: int = 3, output_nc: int = 3,
         dtype=jnp.float32):
    keys = iter(jax.random.split(key, 40))
    p = {}
    cin = input_nc
    for i, c in enumerate(_enc_channels(ngf), 1):
        p[f"e{i}"] = conv2d_init(next(keys), 3, 3, cin, c, dtype=dtype)
        p[f"e{i}_in"] = instance_norm_init(c, dtype)
        cin = c
    for i, c in enumerate(_dec_channels(ngf), 1):
        p[f"d{i}"] = conv2d_transpose_init(next(keys), 3, 3, cin, c, dtype=dtype)
        p[f"d{i}_in"] = instance_norm_init(c, dtype)
        cin = c
    p["d8"] = conv2d_transpose_init(next(keys), 3, 3, cin, output_nc, dtype=dtype)
    return p


def apply(params, x, compute_dtype=None, use_pallas=None, rng=None,
          deterministic=True, remat=False):
    """remat: rematerialize each encoder/decoder stage in the backward
    pass (jax.checkpoint) — the additive skips must stay live either
    way, but the intra-stage intermediates (conv outputs, IN moments)
    are recomputed instead of stored, roughly halving the activation
    live set at full resolution."""
    cd = compute_dtype or x.dtype
    y = x.astype(cd)

    def enc_stage(pc, pin, v, act):
        # bias=False: IN follows directly — exact elision (ops/layers.py)
        v = conv2d(pc, v, 1, "SAME", cd, bias=False)
        return instance_norm(pin, v, act=act, use_pallas=use_pallas)

    def dec_stage(pd, pin, v, skip, k, i):
        # d1-d3 keep the bias: dropout sits between convT and IN
        # (module.py:170-181) and an elementwise-masked shift is NOT
        # spatially constant, so IN does not remove it
        v = conv2d_transpose(pd, v, 1, "SAME", cd, bias=(i <= 3))
        if i <= 3:
            det = deterministic or k is None
            v = dropout(k if not det else None, v, DROP_RATE,
                        deterministic=det)
        v = instance_norm(pin, v, use_pallas=use_pallas)
        v = v + skip
        if i in (3, 7):
            v = relu(v)
        return v

    if remat:
        enc_stage = jax.checkpoint(enc_stage, static_argnums=(3,))
        dec_stage = jax.checkpoint(dec_stage, static_argnums=(5,))

    enc = []
    n_enc = len(_enc_channels(64))
    for i in range(1, n_enc + 1):
        act = "relu" if i == n_enc else "leaky_relu"
        y = enc_stage(params[f"e{i}"], params[f"e{i}_in"], y, act)
        enc.append(y)

    drop_keys = (jax.random.split(rng, 3) if rng is not None else [None] * 3)
    # decoder: d_i adds encoder e_{8-i}
    for i in range(1, 8):
        k = drop_keys[i - 1] if i <= 3 else None
        y = dec_stage(params[f"d{i}"], params[f"d{i}_in"], y, enc[7 - i],
                      k, i)
    y = conv2d_transpose(params["d8"], y, 1, "SAME", cd)
    return tanh(y.astype(jnp.float32))
