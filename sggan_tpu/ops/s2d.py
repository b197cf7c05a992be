"""Space-to-depth convolution for tiny output-channel counts.

The resnet generator's c7s1 head convolves 64 -> 3 channels at full
resolution (module.py:267-268).  As a plain conv the MXU pads N=3 output
channels to a 128-lane tile, wasting 42/43 of the array — measured 23.3
ms fwd+bwd inside the 146 ms train step at 256x512 b=16 (PERF.md round
2).  Computing all r x r output pixels of a block at once turns it into
a STRIDE-r conv with an expanded (k+r-1)^2 kernel and r^2*cout output
channels (48 lanes at r=4, ~16x less lane waste):

    y[b, r*u+pi, r*v+pj, o]
      = sum_{dy,dx,c} x[b, r*u+pi+dy, r*v+pj+dx, c] * w[dy, dx, c, o]
      = conv(x, W2, stride=r)[b, u, v, (pi, pj, o)],
        W2[P, Q, c, (pi, pj, o)] = w[P-pi, Q-pj, c, o]  (zero outside).

Unlike the blocked space-to-depth formulation (which reshapes the input
into r^2*C channels), the strided form needs NO input-side relayout —
the round-2 profiler trace showed the blocked form's backward spending
~3.6 ms/step in transpose copies — and carries (k+r-1)^2 / (kb^2 r^2)
~= 0.7x the taps.  Only the small (H/r, W/r, r^2*cout) output is
depth-to-space'd back.  Numerically identical to the direct conv up to
f32 summation order (validated in tests and against the golden
fixtures).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

_DIMS = ("NHWC", "HWIO", "NHWC")


def applicable(x_padded, w, r: int = 4) -> bool:
    k, _, _, cout = w.shape
    h, wd = x_padded.shape[1] - (k - 1), x_padded.shape[2] - (k - 1)
    return (cout * r * r <= 128 and h % r == 0 and wd % r == 0
            and h >= r and wd >= r)


def _d2s(y, r: int, cout: int):
    b, hb, wb, _ = y.shape
    y = y.reshape(b, hb, wb, r, r, cout)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, hb * r, wb * r, cout)


def _s2d_weights(w, r: int):
    """W2[P, Q, cin, (pi, pj, o)] = w[P-pi, Q-pj, cin, o], zero outside
    the kernel; P, Q in [0, k+r-1)."""
    k, _, cin, cout = w.shape
    kp = k + r - 1
    d = np.arange(kp)[:, None] - np.arange(r)[None, :]   # (P, pi) -> dy
    valid = (d >= 0) & (d < k)
    dc = np.clip(d, 0, k - 1).reshape(-1)
    vmask = jnp.asarray(valid.reshape(-1))
    # rows: (P, pi) indexing dy
    w1 = jnp.where(vmask[:, None, None, None], w[dc], 0.0)
    w1 = w1.reshape(kp, r, k, cin, cout)
    # cols: (Q, pj) indexing dx
    w2 = jnp.where(vmask[None, None, :, None, None], w1[:, :, dc], 0.0)
    w2 = w2.reshape(kp, r, kp, r, cin, cout)
    # (P, pi, Q, pj, c, o) -> (P, Q, c, pi, pj, o)
    w2 = w2.transpose(0, 2, 4, 1, 3, 5)
    return w2.reshape(kp, kp, cin, r * r * cout)


def conv2d_valid_s2d(params, x_padded, r: int = 4, compute_dtype=None):
    """Drop-in for ``conv2d(params, x_padded, 1, "VALID")`` on a
    pre-padded input, via a stride-r conv over r x r output blocks."""
    cd = compute_dtype or x_padded.dtype
    w = params["w"]
    k, _, _, cout = w.shape
    yb = lax.conv_general_dilated(
        x_padded.astype(cd), _s2d_weights(w, r).astype(cd), (r, r),
        "VALID", dimension_numbers=_DIMS)
    y = _d2s(yb, r, cout)
    if "b" in params:
        y = y + params["b"].astype(cd)
    return y


def applicable_reflect(x, w, r: int = 4) -> bool:
    """conv2d_reflect_s2d applicability on the UNPADDED input."""
    k, _, _, cout = w.shape
    h, wd = x.shape[1], x.shape[2]
    return (k % 2 == 1 and cout * r * r <= 128 and h % r == 0
            and wd % r == 0 and h > 2 * k and wd > 2 * k)


def conv2d_reflect_s2d(params, x, r: int = 4, compute_dtype=None):
    """``conv2d_valid_s2d(params, reflect_pad(x, k//2))`` WITHOUT the
    padded activation: the pad rides the strided conv's own zero padding
    (interior outputs never read it), and the k//2-pixel output frame is
    recomputed with proper reflect sources by tiny direct strip convs —
    the strided analogue of ops/layers.conv2d_reflect.

    Why: with the pre-padded form, the conv's BACKWARD materializes the
    gradient at the padded shape and then slices/folds it (a dgrad conv
    at (H+2p, W+2p) + full-tensor slice + mirror strips — ~5.7 ms/step
    at the bench config, PERF.md round-3 trace).  With padding folded
    into the conv, autodiff emits the dgrad at the true shape and only
    the strip fixes touch the borders."""
    from .layers import conv2d
    cd = compute_dtype or x.dtype
    w = params["w"]
    k, _, _, cout = w.shape
    p = k // 2
    # The head fans x out to FIVE consumers (strided conv + 4 strip
    # convs).  Without a boundary XLA duplicates the producing chain
    # (instance-norm normalize, in f32) into each consumer fusion and
    # materializes the f32 intermediates — +2.8G peak at 2048x1024
    # (see PERF.md).  The barrier forces ONE materialized compute-dtype
    # buffer that all five consumers read.
    xcd = lax.optimization_barrier(x.astype(cd))
    yb = lax.conv_general_dilated(
        xcd, _s2d_weights(w, r).astype(cd), (r, r),
        [(p, p), (p, p)], dimension_numbers=_DIMS)
    y = _d2s(yb, r, cout)
    if "b" in params:
        y = y + params["b"].astype(cd)
    # border strips: identical construction to conv2d_reflect
    h = x.shape[1]
    flip_h = lambda t: t[:, ::-1]
    flip_w = lambda t: t[:, :, ::-1]
    wpad = lambda t: jnp.concatenate(
        [flip_w(t[:, :, 1:p + 1]), t, flip_w(t[:, :, -p - 1:-1])], axis=2)
    top_in = jnp.concatenate([flip_h(xcd[:, 1:p + 1]), xcd[:, :2 * p]],
                             axis=1)
    bot_in = jnp.concatenate([xcd[:, -2 * p:], flip_h(xcd[:, -p - 1:-1])],
                             axis=1)
    left_in = jnp.concatenate([flip_w(xcd[:, :, 1:p + 1]), xcd[:, :, :2 * p]],
                              axis=2)
    right_in = jnp.concatenate([xcd[:, :, -2 * p:],
                                flip_w(xcd[:, :, -p - 1:-1])], axis=2)
    y = y.at[:, :p].set(conv2d(params, wpad(top_in), 1, "VALID", cd))
    y = y.at[:, -p:].set(conv2d(params, wpad(bot_in), 1, "VALID", cd))
    y = y.at[:, p:h - p, :p].set(conv2d(params, left_in, 1, "VALID", cd))
    y = y.at[:, p:h - p, -p:].set(conv2d(params, right_in, 1, "VALID", cd))
    return y
