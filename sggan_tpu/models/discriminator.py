"""Semantic-aware mask-gated PatchGAN discriminator — the SG-GAN core.
Capability parity with ``discriminator`` (module.py:272-318), made
resolution-parametric (the reference hard-codes 128x128, module.py:276-277,
and underflows at its own 64x64 CLI default — SURVEY §3.4).

Stack: conv3 s2 SAME ndf (LeakyReLU, no IN) -> conv3 s2 SAME 2ndf (IN+L) ->
conv3 s2 SAME 4ndf (IN+L) -> conv3 s1 SAME 8ndf (IN+L) -> a chain of
conv3 s2 VALID 8ndf (IN+L) while the spatial plane is > 3, then one
conv3 s1 VALID 8ndf (IN+L) -> conv3 SAME n_class -> elementwise multiply
with the one-hot class mask (broadcast) -> reduce_sum over the class axis:
a per-patch score conditioned on class identity (module.py:311-314).

At 128x128 this reproduces the reference's h31/h32/h33 chain exactly
(16 -> 7 -> 3 -> 1).

``head``:
* "global" (default, reference semantics): the VALID chain crushes the
  score map to ~1x1, which is then broadcast against the mask grid;
* "patch" (the SG-GAN paper's stride-8 design): skip the VALID chain and
  emit the class map directly at the h3 grid (H/8 x W/8), exactly matching
  the stride-8 mask (Config.mask_stride).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import (conv2d, conv2d_init, instance_norm, instance_norm_init,
                   leaky_relu)


def _valid_chain(h: int, w: int) -> list:
    """Strides of the VALID tail for a given post-h3 grid. Returns e.g.
    [2, 2, 1] for 16x16 (the reference's h31/h32/h33)."""
    chain = []
    while min(h, w) > 3:
        chain.append(2)
        h = (h - 3) // 2 + 1
        w = (w - 3) // 2 + 1
    if min(h, w) >= 3:
        chain.append(1)
    return chain


def init(key, ndf: int = 64, input_nc: int = 3, n_class: int = 34,
         image_size: Tuple[int, int] = (128, 128), head: str = "global",
         dtype=jnp.float32):
    keys = iter(jax.random.split(key, 16))
    p = {}
    p["h0"] = conv2d_init(next(keys), 3, 3, input_nc, ndf, dtype=dtype)
    p["h1"] = conv2d_init(next(keys), 3, 3, ndf, ndf * 2, dtype=dtype)
    p["h1_in"] = instance_norm_init(ndf * 2, dtype)
    p["h2"] = conv2d_init(next(keys), 3, 3, ndf * 2, ndf * 4, dtype=dtype)
    p["h2_in"] = instance_norm_init(ndf * 4, dtype)
    p["h3"] = conv2d_init(next(keys), 3, 3, ndf * 4, ndf * 8, dtype=dtype)
    p["h3_in"] = instance_norm_init(ndf * 8, dtype)
    if head == "global":
        gh, gw = image_size[0] // 8, image_size[1] // 8
        for i, _ in enumerate(_valid_chain(gh, gw)):
            p[f"v{i}"] = conv2d_init(next(keys), 3, 3, ndf * 8, ndf * 8,
                                     dtype=dtype)
            p[f"v{i}_in"] = instance_norm_init(ndf * 8, dtype)
    p["h4"] = conv2d_init(next(keys), 3, 3, ndf * 8, n_class, dtype=dtype)
    return p


def apply(params, x, mask, compute_dtype=None, use_pallas=None,
          head: str = "global"):
    """x: (N, H, W, C) image; mask: (N, hm, wm, n_class) one-hot class mask.
    Returns per-patch class-gated logits (N, hm', wm', 1)."""
    cd = compute_dtype or x.dtype
    y = x.astype(cd)
    y = leaky_relu(conv2d(params["h0"], y, 2, "SAME", cd))
    # bias=False on every IN-followed conv — exact elision (ops/layers.py)
    y = conv2d(params["h1"], y, 2, "SAME", cd, bias=False)
    y = instance_norm(params["h1_in"], y, act="leaky_relu", use_pallas=use_pallas)
    y = conv2d(params["h2"], y, 2, "SAME", cd, bias=False)
    y = instance_norm(params["h2_in"], y, act="leaky_relu", use_pallas=use_pallas)
    y = conv2d(params["h3"], y, 1, "SAME", cd, bias=False)
    y = instance_norm(params["h3_in"], y, act="leaky_relu", use_pallas=use_pallas)

    if head == "global":
        for i, s in enumerate(_valid_chain(y.shape[1], y.shape[2])):
            y = conv2d(params[f"v{i}"], y, s, "VALID", cd, bias=False)
            y = instance_norm(params[f"v{i}_in"], y, act="leaky_relu",
                              use_pallas=use_pallas)

    y = conv2d(params["h4"], y, 1, "SAME", cd).astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    if y.shape[1:3] != mask.shape[1:3] and y.shape[1:3] != (1, 1):
        # rationalized broadcast: collapse the score map to a global class
        # score before gating (the reference relies on its map being 1x1).
        y = jnp.mean(y, axis=(1, 2), keepdims=True)
    gated = y * mask
    return jnp.sum(gated, axis=-1, keepdims=True)
