"""Space-to-depth convolution for tiny output-channel counts.

The resnet generator's c7s1 head convolves 64 -> 3 channels at full
resolution (module.py:267-268).  As a plain conv the MXU pads N=3 output
channels to a 128-lane tile, wasting 42/43 of the array — measured 23.3
ms fwd+bwd inside the 146 ms train step at 256x512 b=16 (PERF.md round
2).  Computing all rh x rw output pixels of a block at once turns it
into a STRIDE-(rh,rw) conv with an expanded (k+rh-1)x(k+rw-1) kernel
and rh*rw*cout output channels:

    y[b, rh*u+pi, rw*v+pj, o]
      = sum_{dy,dx,c} x[b, rh*u+pi+dy, rw*v+pj+dx, c] * w[dy, dx, c, o]
      = conv(x, W2, stride=(rh,rw))[b, u, v, (pi, pj, o)],
        W2[P, Q, c, (pi, pj, o)] = w[P-pi, Q-pj, c, o]  (zero outside).

Unlike the blocked space-to-depth formulation (which reshapes the input
into r^2*C channels), the strided form needs NO input-side relayout —
the round-2 profiler trace showed the blocked form's backward spending
~3.6 ms/step in transpose copies.  Only the small (H/rh, W/rw,
rh*rw*cout) output is depth-to-space'd back.  Numerically identical to
the direct conv up to f32 summation order (validated in tests and
against the golden fixtures).

Block-shape choice (MXU cost model, validated on chip): with the MXU
padding output channels to a 128 lane tile, the relative cost of a
block shape is taps x 128/lanes = (k+rh-1)(k+rw-1) * 128/(rh*rw*cout).
For k=7, cout=3:  4x4 -> 100 taps / 48 lanes -> 266;  4x8 -> 140 taps /
96 lanes -> 186 (~30% less MXU time);  8x8 needs 192 lanes (> 128, not
tileable).  ``best_block`` picks the cheapest admissible shape.
Measured fwd+bwd of the 7x7 64->3 head at (16, 256, 512) bf16
(perf_head_block.py, round 3): 4x4 10.32 ms, 4x8 8.20 ms, 8x4 8.02 ms
— the model's ~30% holds on silicon, and of the cost-tied pair the
TALLER block wins by ~2% (stride-8 rows read fewer overlapping input
rows per output row), so ties break toward larger rh.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

_DIMS = ("NHWC", "HWIO", "NHWC")


def _rhw(r) -> tuple:
    return (r, r) if isinstance(r, int) else tuple(r)


def _block_cost(k: int, cout: int, rh: int, rw: int) -> float:
    """taps x lane-padding factor — relative MXU time per output pixel."""
    lanes = rh * rw * cout
    return (k + rh - 1) * (k + rw - 1) * 128.0 / lanes


def best_block(k: int, cout: int, h: int, w: int) -> tuple:
    """Cheapest (rh, rw) with rh|h, rw|w and rh*rw*cout <= 128 lanes.

    rh is scanned descending so cost ties resolve to the taller block —
    the measured winner on chip (see module docstring)."""
    best, best_c = None, float("inf")
    for rh in (16, 8, 4, 2, 1):
        for rw in (1, 2, 4, 8, 16):
            if rh * rw * cout > 128 or h % rh or w % rw:
                continue
            if rh > h or rw > w:
                continue
            c = _block_cost(k, cout, rh, rw)
            if c < best_c:
                best, best_c = (rh, rw), c
    return best or (1, 1)


def applicable(x_padded, w, r=4) -> bool:
    rh, rw = _rhw(r)
    k, _, _, cout = w.shape
    h, wd = x_padded.shape[1] - (k - 1), x_padded.shape[2] - (k - 1)
    return (cout * rh * rw <= 128 and h % rh == 0 and wd % rw == 0
            and h >= rh and wd >= rw)


def _d2s(y, rh: int, rw: int, cout: int):
    b, hb, wb, _ = y.shape
    y = y.reshape(b, hb, wb, rh, rw, cout)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, hb * rh, wb * rw, cout)


def _s2d_weights(w, rh: int, rw: int):
    """W2[P, Q, cin, (pi, pj, o)] = w[P-pi, Q-pj, cin, o], zero outside
    the kernel; P in [0, k+rh-1), Q in [0, k+rw-1)."""
    k, _, cin, cout = w.shape
    kph, kpw = k + rh - 1, k + rw - 1
    dh = np.arange(kph)[:, None] - np.arange(rh)[None, :]  # (P, pi) -> dy
    vh = (dh >= 0) & (dh < k)
    dhc = np.clip(dh, 0, k - 1).reshape(-1)
    vhm = jnp.asarray(vh.reshape(-1))
    # rows: (P, pi) indexing dy
    w1 = jnp.where(vhm[:, None, None, None], w[dhc], 0.0)
    w1 = w1.reshape(kph, rh, k, cin, cout)
    dw = np.arange(kpw)[:, None] - np.arange(rw)[None, :]  # (Q, pj) -> dx
    vw = (dw >= 0) & (dw < k)
    dwc = np.clip(dw, 0, k - 1).reshape(-1)
    vwm = jnp.asarray(vw.reshape(-1))
    # cols: (Q, pj) indexing dx
    w2 = jnp.where(vwm[None, None, :, None, None], w1[:, :, dwc], 0.0)
    w2 = w2.reshape(kph, rh, kpw, rw, cin, cout)
    # (P, pi, Q, pj, c, o) -> (P, Q, c, pi, pj, o)
    w2 = w2.transpose(0, 2, 4, 1, 3, 5)
    return w2.reshape(kph, kpw, cin, rh * rw * cout)


def conv2d_valid_s2d(params, x_padded, r=4, compute_dtype=None):
    """Drop-in for ``conv2d(params, x_padded, 1, "VALID")`` on a
    pre-padded input, via a stride-(rh,rw) conv over rh x rw output
    blocks."""
    rh, rw = _rhw(r)
    cd = compute_dtype or x_padded.dtype
    w = params["w"]
    k, _, _, cout = w.shape
    yb = lax.conv_general_dilated(
        x_padded.astype(cd), _s2d_weights(w, rh, rw).astype(cd), (rh, rw),
        "VALID", dimension_numbers=_DIMS)
    y = _d2s(yb, rh, rw, cout)
    if "b" in params:
        y = y + params["b"].astype(cd)
    return y


def applicable_reflect(x, w, r=4) -> bool:
    """conv2d_reflect_s2d applicability on the UNPADDED input."""
    rh, rw = _rhw(r)
    k, _, _, cout = w.shape
    h, wd = x.shape[1], x.shape[2]
    return (k % 2 == 1 and cout * rh * rw <= 128 and h % rh == 0
            and wd % rw == 0 and h > 2 * k and wd > 2 * k)


def conv2d_reflect_s2d(params, x, r=4, compute_dtype=None):
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
    rh, rw = _rhw(r)
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
        xcd, _s2d_weights(w, rh, rw).astype(cd), (rh, rw),
        [(p, p), (p, p)], dimension_numbers=_DIMS)
    y = _d2s(yb, rh, rw, cout)
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
