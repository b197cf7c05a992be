"""Johnson-style ResNet generator — capability parity with the reference's
``generator_resnet`` (module.py:219-269), resolution-parametric instead of
the reference's hard-coded 64x64 input (module.py:225).

Architecture: reflect-pad 3 -> c7s1-ngf -> d(2ngf) -> d(4ngf) ->
9 residual blocks (reflect-pad 1 + conv3 VALID + IN + relu, twice, identity
skip; module.py:208-217) -> u(2ngf) -> u(ngf) -> reflect-pad 3 + c7s1-out
-> tanh.  Instance norm everywhere, Keras-default (glorot) conv init.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import (conv2d, conv2d_init, conv2d_reflect, conv2d_transpose,
                   conv2d_transpose_init, instance_norm, instance_norm_init,
                   reflect_pad, tanh)

N_BLOCKS = 9


def init(key, ngf: int = 64, input_nc: int = 3, output_nc: int = 3,
         dtype=jnp.float32):
    keys = iter(jax.random.split(key, 64))
    p = {}
    p["c1"] = conv2d_init(next(keys), 7, 7, input_nc, ngf, dtype=dtype)
    p["c1_in"] = instance_norm_init(ngf, dtype)
    p["c2"] = conv2d_init(next(keys), 3, 3, ngf, ngf * 2, dtype=dtype)
    p["c2_in"] = instance_norm_init(ngf * 2, dtype)
    p["c3"] = conv2d_init(next(keys), 3, 3, ngf * 2, ngf * 4, dtype=dtype)
    p["c3_in"] = instance_norm_init(ngf * 4, dtype)
    for i in range(N_BLOCKS):
        b = {}
        b["conv1"] = conv2d_init(next(keys), 3, 3, ngf * 4, ngf * 4, dtype=dtype)
        b["in1"] = instance_norm_init(ngf * 4, dtype)
        b["conv2"] = conv2d_init(next(keys), 3, 3, ngf * 4, ngf * 4, dtype=dtype)
        b["in2"] = instance_norm_init(ngf * 4, dtype)
        p[f"r{i + 1}"] = b
    p["d1"] = conv2d_transpose_init(next(keys), 3, 3, ngf * 4, ngf * 2, dtype=dtype)
    p["d1_in"] = instance_norm_init(ngf * 2, dtype)
    p["d2"] = conv2d_transpose_init(next(keys), 3, 3, ngf * 2, ngf, dtype=dtype)
    p["d2_in"] = instance_norm_init(ngf, dtype)
    p["out"] = conv2d_init(next(keys), 7, 7, ngf, output_nc, dtype=dtype)
    return p


def _res_block(b, x, cd, use_pallas):
    # conv2d_reflect == reflect_pad(1) + VALID conv without materializing
    # the padded activation (ops/layers.py); bias=False everywhere an IN
    # follows — exact elision, see ops/layers.py conv2d docstring
    y = conv2d_reflect(b["conv1"], x, cd, bias=False)
    y = instance_norm(b["in1"], y, act="relu", use_pallas=use_pallas)
    y = conv2d_reflect(b["conv2"], y, cd, bias=False)
    y = instance_norm(b["in2"], y, use_pallas=use_pallas)
    return y + x


def apply(params, x, compute_dtype=None, use_pallas=None, rng=None,
          deterministic=True, remat=False, pad_free_head=True):
    """x: (N, H, W, C) with H, W divisible by 4. Returns float32 tanh image.

    remat: rematerialize each residual block in the backward pass
    (jax.checkpoint) — trades one extra block forward for not storing
    the block's four intermediate activations, the bulk of the
    generator's live set.  Enables native-resolution (e.g. 2048x1024)
    training within one chip's HBM.  Numerics-identical by
    construction (tested).

    pad_free_head: use the strided-padding + border-strip head
    (ops/s2d.conv2d_reflect_s2d, ~4 ms/step faster at 256x512) instead
    of the pre-padded s2d head.  Same math up to f32 summation order.
    The train step passes ``not cfg.remat``: under memory pressure the
    strip machinery's extra temporaries tipped the native-res
    fused-scan program over HBM (18.6 vs 15.75G) where the padded head
    compiled — the ms win is the wrong trade there."""
    cd = compute_dtype or x.dtype
    y = conv2d_reflect(params["c1"], x.astype(cd), cd, bias=False)
    y = instance_norm(params["c1_in"], y, act="relu", use_pallas=use_pallas)
    y = conv2d(params["c2"], y, 2, "SAME", cd, bias=False)
    y = instance_norm(params["c2_in"], y, act="relu", use_pallas=use_pallas)
    y = conv2d(params["c3"], y, 2, "SAME", cd, bias=False)
    y = instance_norm(params["c3_in"], y, act="relu", use_pallas=use_pallas)
    block = jax.checkpoint(_res_block, static_argnums=(2, 3)) if remat \
        else _res_block
    for i in range(N_BLOCKS):
        y = block(params[f"r{i + 1}"], y, cd, use_pallas)
    y = conv2d_transpose(params["d1"], y, 2, "SAME", cd, bias=False)
    y = instance_norm(params["d1_in"], y, act="relu", use_pallas=use_pallas)
    y = conv2d_transpose(params["d2"], y, 2, "SAME", cd, bias=False)
    y = instance_norm(params["d2_in"], y, act="relu", use_pallas=use_pallas)
    # space-to-depth form of the 64->3 head: same math, ~16x less MXU
    # lane waste at N=3; reflect handled pad-free (strided conv padding +
    # border strips — no padded activation in fwd OR bwd; ops/s2d.py)
    from ..ops import s2d
    kh, _, _, cout = params["out"]["w"].shape
    r = s2d.best_block(kh, cout, y.shape[1], y.shape[2])
    if r[0] * r[1] > 1 and pad_free_head and \
            s2d.applicable_reflect(y, params["out"]["w"], r=r):
        y = s2d.conv2d_reflect_s2d(params["out"], y, r=r, compute_dtype=cd)
    else:
        y = reflect_pad(y, 3)
        if r[0] * r[1] > 1 and s2d.applicable(y, params["out"]["w"], r=r):
            y = s2d.conv2d_valid_s2d(params["out"], y, r=r, compute_dtype=cd)
        else:
            y = conv2d(params["out"], y, 1, "VALID", cd)
    return tanh(y.astype(jnp.float32))
