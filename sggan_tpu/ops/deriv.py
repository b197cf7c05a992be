"""Depthwise image-derivative kernels (the SG-GAN semantic-gradient
machinery).

The reference builds two kinds of derivative filters:

* Sobel gx/gy inside ``tf_deriv`` (module.py:325-334), used by
  ``gradloss_criterion`` (module.py:347-351);
* simple central-difference kernels [[0,0,0],[-1,0,1],[0,0,0]] and its
  transpose in ``sggan._build_model`` (model.py:108-111), applied to a
  REFLECT-padded seg map to produce the class-boundary weight map
  ``weighted_seg_A = |sign(sum |∇seg|)|`` (model.py:115-119).

Both become a single depthwise conv here.  TF's depthwise kernel layout
``(kh, kw, C, mult)`` maps onto lax grouped convolution with
``feature_group_count=C`` and an HWIO kernel ``(kh, kw, 1, C*mult)``; the
channel-major output ordering (out = c*mult + m) matches TF.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from .layers import reflect_pad

_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
_SOBEL_Y = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], np.float32)
_DIFF_X = np.array([[0, 0, 0], [-1, 0, 1], [0, 0, 0]], np.float32)
_DIFF_Y = np.array([[0, -1, 0], [0, 0, 0], [0, 1, 0]], np.float32)


def _stack_tf(kx, ky, n_ch: int) -> np.ndarray:
    """TF depthwise layout (kh, kw, C, 2): per-channel copies of (kx, ky).
    Equivalent to tf_kernel_prep_3d + np.stack (module.py:322-323, 333)."""
    gx = np.tile(kx, (n_ch, 1, 1)).swapaxes(0, 1).swapaxes(1, 2)
    gy = np.tile(ky, (n_ch, 1, 1)).swapaxes(0, 1).swapaxes(1, 2)
    return np.stack([gx, gy], axis=-1)  # (3, 3, C, 2)


def deriv_kernel_sobel(n_ch: int) -> jnp.ndarray:
    return jnp.asarray(_stack_tf(_SOBEL_X, _SOBEL_Y, n_ch))


def deriv_kernel_diff(n_ch: int) -> jnp.ndarray:
    return jnp.asarray(_stack_tf(_DIFF_X, _DIFF_Y, n_ch))


def depthwise_conv2d(x, w_tf, padding: str = "SAME"):
    """tf.nn.depthwise_conv2d parity: x NHWC, w_tf (kh, kw, C, mult)."""
    kh, kw, c, mult = w_tf.shape
    w = w_tf.reshape(kh, kw, 1, c * mult)  # c-major flatten == TF ordering
    xf = x.astype(jnp.float32)
    return lax.conv_general_dilated(
        xf, w.astype(jnp.float32), (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, preferred_element_type=jnp.float32)


def tf_deriv(x, padding: str = "SAME"):
    """Sobel derivative stack — parity with module.py:325-334.
    x: (N, H, W, C) -> (N, H, W, 2C) channel-major (dx, dy per channel)."""
    return depthwise_conv2d(x, deriv_kernel_sobel(x.shape[-1]), padding)


def _shift(x, di: int, dj: int):
    """out[i, j] = x[i+di, j+dj] with zeros outside (SAME-conv reach).
    Pure pad+slice — fuses into XLA loop fusions, unlike a conv."""
    n, h, w, c = x.shape
    x = jnp.pad(x, ((0, 0), (max(-di, 0), max(di, 0)),
                    (max(-dj, 0), max(dj, 0)), (0, 0)))
    return x[:, max(di, 0):max(di, 0) + h, max(dj, 0):max(dj, 0) + w, :]


def sobel_xy(x):
    """(dx, dy) Sobel derivatives, numerically equal to ``tf_deriv``'s
    SAME depthwise conv but built from shifted adds so XLA fuses them into
    the consuming loss instead of materializing (N, H, W, 2C) conv
    outputs (the conv forms cost ~9 ms/step at 256x512 b=16; this form is
    HBM-minimal — see PERF.md round 2)."""
    xf = x.astype(jnp.float32)
    left = _shift(xf, 0, -1)
    right = _shift(xf, 0, 1)
    up = _shift(xf, -1, 0)
    down = _shift(xf, 1, 0)
    ul = _shift(xf, -1, -1)
    ur = _shift(xf, -1, 1)
    dl = _shift(xf, 1, -1)
    dr = _shift(xf, 1, 1)
    dx = (ur - ul) + 2.0 * (right - left) + (dr - dl)
    dy = (dl - ul) + 2.0 * (down - up) + (dr - ur)
    return dx, dy


def seg_boundary_weight(seg):
    """Class-boundary weight map for the gradient-sensitive loss — parity
    with model.py:115-119: REFLECT-pad 1, central-difference depthwise conv
    (VALID), |sign(sum_c |∇seg|)| -> (N, H, W, 1) in {0, 1}.

    Built from shifted adds on the reflect-padded map (numerically equal
    to the depthwise-conv form, fully fusable)."""
    segp = reflect_pad(seg.astype(jnp.float32), 1)
    n, hp, wp, c = segp.shape
    inner = lambda di, dj: segp[:, 1 + di:hp - 1 + di, 1 + dj:wp - 1 + dj, :]
    dx = inner(0, 1) - inner(0, -1)
    dy = inner(1, 0) - inner(-1, 0)
    total = jnp.sum(jnp.abs(dx), axis=-1, keepdims=True) \
        + jnp.sum(jnp.abs(dy), axis=-1, keepdims=True)
    return jnp.abs(jnp.sign(total))
