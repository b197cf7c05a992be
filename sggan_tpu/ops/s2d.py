"""Space-to-depth convolution for tiny output-channel counts.

The resnet generator's c7s1 head convolves 64 -> 3 channels at full
resolution (module.py:267-268).  As a plain conv the MXU pads N=3 output
channels to a 128-lane tile, wasting 42/43 of the array — measured 23.3
ms fwd+bwd inside the 146 ms train step at 256x512 b=16 (PERF.md round
2).  Restructured over r x r space-to-depth blocks the same convolution
becomes k'=ceil((k-1+r)/r)+... taps over r^2*C input channels with
r^2*cout output channels (48 lanes at r=4), cutting the lane waste ~16x
at the cost of one relayout each side.  Numerically identical to the
direct conv up to f32 summation order (validated in tests and against
the golden fixtures).
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


def _s2d(x, r: int):
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // r, w // r,
                                                 r * r * c)


def _d2s(y, r: int, cout: int):
    b, hb, wb, _ = y.shape
    y = y.reshape(b, hb, wb, r, r, cout)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, hb * r, wb * r, cout)


def _s2d_weights(w, r: int, kb: int):
    """w_s2d[U, V, (uph, vph, cin), (pi, pj, o)] =
    w[r*U + uph - pi, r*V + vph - pj, cin, o], zero outside the kernel."""
    k, _, cin, cout = w.shape
    u = (r * np.arange(kb)[:, None, None]
         + np.arange(r)[None, :, None]          # uph
         - np.arange(r)[None, None, :])         # pi
    valid = (u >= 0) & (u < k)
    uc = jnp.asarray(np.clip(u, 0, k - 1).reshape(-1))
    vmask = jnp.asarray(valid.reshape(-1))
    wp = jnp.where(vmask[:, None, None, None], w[uc], 0.0)
    wp = wp.reshape(kb, r, r, k, cin, cout)
    wpv = jnp.where(vmask[None, None, None, :, None, None],
                    wp[:, :, :, uc], 0.0)
    wpv = wpv.reshape(kb, r, r, kb, r, r, cin, cout)
    # (U, uph, pi, V, vph, pj, c, o) -> (U, V, uph, vph, c, pi, pj, o)
    wpv = wpv.transpose(0, 3, 1, 4, 6, 2, 5, 7)
    return wpv.reshape(kb, kb, r * r * cin, r * r * cout)


def conv2d_valid_s2d(params, x_padded, r: int = 4, compute_dtype=None):
    """Drop-in for ``conv2d(params, x_padded, 1, "VALID")`` on a
    pre-padded input, via space-to-depth blocks."""
    cd = compute_dtype or x_padded.dtype
    w = params["w"]
    k, _, _, cout = w.shape
    b, hp, wp_, _ = x_padded.shape
    ho, wo = hp - (k - 1), wp_ - (k - 1)
    kb = (r + k - 2) // r + 1
    hb, wb = ho // r + kb - 1, wo // r + kb - 1
    x = jnp.pad(x_padded.astype(cd),
                ((0, 0), (0, hb * r - hp), (0, wb * r - wp_), (0, 0)))
    yb = lax.conv_general_dilated(
        _s2d(x, r), _s2d_weights(w, r, kb).astype(cd), (1, 1), "VALID",
        dimension_numbers=_DIMS)
    y = _d2s(yb, r, cout)
    if "b" in params:
        y = y + params["b"].astype(cd)
    return y
