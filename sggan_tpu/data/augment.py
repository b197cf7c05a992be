"""PRNG-keyed JAX augmentation — the TPU-native replacement for the
reference's imgaug pipeline (utils.py:55-103).

The reference's seq2 applies, in random order: Fliplr(0.5),
Crop(percent=(0.2, 0.4) per side, keep_size), Affine(translate ±10 %,
rotate ±1°) to a channel-concat of image+seg so both transform identically
(utils.py:80-103).  Here the crop/translate/rotate compose into a SINGLE
2x3 affine matrix applied with one bilinear gather
(jax.scipy.ndimage.map_coordinates) — one fused kernel instead of three
sequential resamples; the sampled parameter distributions match imgaug's.
The random-order application is approximated by the composition (the three
ops nearly commute at these magnitudes).

The reference does NOT warp the class-id map in its augment path (one_hot
runs on the unaugmented seg_class, utils.py:190) — reproduced by
augmenting only (img, seg) pairs.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


class AffineParams(NamedTuple):
    matrix: jnp.ndarray   # (2, 3) output->input coordinate map
    flip: jnp.ndarray     # scalar bool


def random_affine_params(key, h: int, w: int,
                         crop_lo: float = 0.2, crop_hi: float = 0.4,
                         translate: float = 0.1,
                         rotate_deg: float = 1.0) -> AffineParams:
    """Sample per-image augmentation parameters matching imgaug seq2."""
    k_flip, k_crop, k_trans, k_rot = jax.random.split(key, 4)
    flip = jax.random.bernoulli(k_flip, 0.5)

    # per-side crop percents (imgaug Crop sample_independently=True)
    top, bot, left, right = jax.random.uniform(
        k_crop, (4,), minval=crop_lo, maxval=crop_hi)
    # keep_size crop == scale+shift: out pixel (y, x) samples input at
    # (top*h + y*(1-top-bot), left*w + x*(1-left-right))
    sy = 1.0 - top - bot
    sx = 1.0 - left - right
    ty0 = top * h
    tx0 = left * w

    dty, dtx = jax.random.uniform(k_trans, (2,), minval=-translate,
                                  maxval=translate)
    theta = jax.random.uniform(k_rot, (), minval=-rotate_deg,
                               maxval=rotate_deg) * math.pi / 180.0

    # rotation about the image centre (output coords -> input coords is the
    # inverse rotation), then translate (shift content by d*size means
    # sampling from x - d*w), then the crop scale/offset.
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # compose: p_in = crop(translate(rotate(p_out)))
    # rotate: q = R (p - c) + c ; translate: q -= (dty*h, dtx*w)
    # crop: q = diag(sy, sx) q + (ty0, tx0)
    # Written as explicit scalar arithmetic, NOT 2x2 matmuls: on TPU a
    # default-precision dot runs in bf16, rounding these coefficients by
    # up to ~2e-3 (~1 px of sample-position error at the image edge) —
    # same bug class as the einsum in affine_warp (PERF.md round 5).
    rc_y = cos * cy + sin * cx          # (R c)_y
    rc_x = -sin * cy + cos * cx         # (R c)_x
    m = jnp.stack([jnp.stack([sy * cos, sy * sin]),
                   jnp.stack([-sx * sin, sx * cos])])
    const = jnp.stack([sy * (cy - rc_y - dty * h) + ty0,
                       sx * (cx - rc_x - dtx * w) + tx0])
    matrix = jnp.concatenate([m, const[:, None]], axis=1)  # (2, 3)
    return AffineParams(matrix=matrix, flip=flip)


def conjugate_affine(params: AffineParams, src_hw, out_hw) -> AffineParams:
    """Re-express an affine sampled in src (e.g. square-resized) pixel
    coordinates so it can be applied on the out_hw grid instead:
    with D = diag(src/out), M' = D^-1 M D and c' = D^-1 c.  Exactly the
    same geometry, so the warp can run after the (cheaper) downscale."""
    d = jnp.array([src_hw[0] / out_hw[0], src_hw[1] / out_hw[1]],
                  jnp.float32)
    m, c = params.matrix[:, :2], params.matrix[:, 2]
    m2 = (m * d[None, :]) / d[:, None]
    c2 = c / d
    return AffineParams(matrix=jnp.concatenate([m2, c2[:, None]], axis=1),
                        flip=params.flip)


def affine_warp(img, params: AffineParams, order: int = 1):
    """Apply the affine map with a single bilinear gather.
    img: (H, W, C) float. Returns same shape.

    Two TPU-motivated choices, both bitwise-verified against the naive
    einsum + per-channel map_coordinates form on CPU AND TPU
    (perf_warp.py; PERF.md round 5):

    * coordinates via explicit mul-add, NOT einsum — on TPU a
      default-precision dot runs the coordinate map in bf16, quantizing
      sample positions by up to ~2 px at 512-wide images;
    * the 4 bilinear taps gather rows of the (H*W, C) table instead of
      vmapping C scalar-gathers per tap — each gathered element moves a
      contiguous C-vector, 1.2x faster on TPU silicon (and 1.3x on CPU).
    """
    h, w = img.shape[:2]
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    xx = jnp.where(params.flip, (w - 1) - xx, xx)
    m, c = params.matrix[:, :2], params.matrix[:, 2]
    y = m[0, 0] * yy + m[0, 1] * xx + c[0]
    x = m[1, 0] * yy + m[1, 1] * xx + c[1]
    if order != 1:
        src = jnp.stack([y, x])
        def warp_channel(ch):
            return jax.scipy.ndimage.map_coordinates(
                ch, [src[0], src[1]], order=order, mode="nearest")
        return jax.vmap(warp_channel, in_axes=-1, out_axes=-1)(img)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy = (y - y0)[..., None]
    wx = (x - x0)[..., None]
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    flat = img.reshape(h * w, -1)
    g = lambda yi, xi: jnp.take(flat, yi * w + xi, axis=0)
    return ((1 - wy) * (1 - wx) * g(y0i, x0i)
            + (1 - wy) * wx * g(y0i, x1i)
            + wy * (1 - wx) * g(y1i, x0i)
            + wy * wx * g(y1i, x1i))


def _blur1d_5tap(x, kern, axis: int):
    """5-tap correlation along `axis` with edge padding (imgaug's default
    border handling)."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (2, 2)
    xp = jnp.pad(x, pad, mode="edge")
    out = jnp.zeros_like(x)
    for i in range(5):
        out = out + kern[i] * jax.lax.slice_in_dim(
            xp, i, i + x.shape[axis], axis=axis)
    return out


def photometric_augment(key, img):
    """The reference's dormant imgaug seq1 (utils.py:57-78), realized as
    PRNG-keyed device transforms on a (H, W, C) float image in [0, 1]:

    * Sometimes(0.5, GaussianBlur(sigma ~ U(0, 0.5))) — separable 5-tap
      gaussian (ample for sigma <= 0.5);
    * LinearContrast(alpha ~ U(0.75, 1.5)) about imgaug's uint8 pivot 127;
    * AdditiveGaussianNoise(scale ~ U(0, 0.05*255)), per-pixel-AND-channel
      for 50% of images, per-pixel (shared across channels) otherwise;
    * Multiply(m ~ U(0.8, 1.2)), per-channel for 20% of images.

    Each stage saturates to [0, 1] like imgaug's uint8 arithmetic.  The
    random-order application is approximated by this fixed composition
    (same marginal distributions; the ops nearly commute at these
    magnitudes) — the same rationalization augment_pair makes for seq2.
    The reference's (commented-out) call site would have distorted the seg
    channels too (utils.py:99-101); photometric ops apply to the PHOTO
    only here, since label colors must stay exact.
    """
    (k_blur_on, k_sigma, k_alpha, k_nscale, k_npc, k_noise,
     k_mpc, k_mult) = jax.random.split(key, 8)

    # blur
    sigma = jnp.where(jax.random.bernoulli(k_blur_on, 0.5),
                      jax.random.uniform(k_sigma, (), minval=0.0,
                                         maxval=0.5), 0.0)
    r = jnp.arange(-2, 3, dtype=jnp.float32)
    raw = jnp.exp(-0.5 * jnp.square(r / jnp.maximum(sigma, 1e-6)))
    ident = jnp.array([0.0, 0.0, 1.0, 0.0, 0.0], jnp.float32)
    kern = jnp.where(sigma > 1e-3, raw / jnp.sum(raw), ident)
    img = _blur1d_5tap(_blur1d_5tap(img, kern, 0), kern, 1)

    # linear contrast (imgaug pivots uint8 at 127)
    pivot = 127.0 / 255.0
    alpha = jax.random.uniform(k_alpha, (), minval=0.75, maxval=1.5)
    img = jnp.clip(pivot + alpha * (img - pivot), 0.0, 1.0)

    # additive gaussian noise
    scale = jax.random.uniform(k_nscale, (), minval=0.0, maxval=0.05)
    per_channel = jax.random.bernoulli(k_npc, 0.5)
    noise_c = jax.random.normal(k_noise, img.shape)
    noise_p = noise_c[..., :1]  # shared-across-channels variant, same key
    noise = jnp.where(per_channel, noise_c,
                      jnp.broadcast_to(noise_p, img.shape))
    img = jnp.clip(img + scale * noise, 0.0, 1.0)

    # brightness multiply
    m_pc = jax.random.bernoulli(k_mpc, 0.2)
    m = jax.random.uniform(k_mult, (img.shape[-1],), minval=0.8, maxval=1.2)
    mult = jnp.where(m_pc, m, jnp.broadcast_to(m[:1], m.shape))
    return jnp.clip(img * mult, 0.0, 1.0)


def augment_pair(key, img, seg):
    """Augment an (img, seg) pair with identical geometry — parity with
    DataAugmentation.augmentation_func (utils.py:94-103), fused into one
    warp over the channel concat."""
    p = random_affine_params(key, img.shape[0], img.shape[1])
    both = jnp.concatenate([img, seg], axis=-1)
    warped = affine_warp(both, p)
    return warped[..., : img.shape[-1]], warped[..., img.shape[-1]:]
