#!/usr/bin/env python
"""Micro-benchmark + equivalence gate for the augment warp's bilinear
gather (the dominant cost of the e2e fused-aug gap, PERF.md round 5).

Compares the production `augment.affine_warp` (4 row-gathers from an
(H*W, C) table — each gathered element moves a contiguous C-vector)
against the legacy form (per-channel map_coordinates: C separate
scalar-gathers per tap).  Same taps, same weights, same edge clamping;
bitwise equality is asserted before timing.  Measured (this script):
row-gather 1.22x on TPU silicon, 1.31x on CPU.

History note: the original coordinate map used jnp.einsum, which on TPU
runs at default (bf16) dot precision and quantized sample positions by
up to ~2 px at 512-wide images — both forms here use exact-f32 explicit
mul-add (the fix is in augment.affine_warp; PERF.md round 5).

    python perf_warp.py            # on whatever backend owns the process
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from sggan_tpu.data.augment import (AffineParams, affine_warp,
                                    conjugate_affine, random_affine_params)

H, W, C = 256, 512, 6
B = 12  # the fused-aug warped half at b=12 doubling


def affine_warp_legacy(img, params: AffineParams):
    """Per-channel map_coordinates form (exact-f32 coordinates)."""
    h, w = img.shape[:2]
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    xx = jnp.where(params.flip, (w - 1) - xx, xx)
    m, c = params.matrix[:, :2], params.matrix[:, 2]
    y = m[0, 0] * yy + m[0, 1] * xx + c[0]
    x = m[1, 0] * yy + m[1, 1] * xx + c[1]

    def warp_channel(ch):
        return jax.scipy.ndimage.map_coordinates(ch, [y, x], order=1,
                                                 mode="nearest")
    return jax.vmap(warp_channel, in_axes=-1, out_axes=-1)(img)


def timeit(fn, *args, iters=20, warm=3):
    for _ in range(warm):
        out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def main():
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(7)
    img = jax.random.uniform(key, (B, H, W, C), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(3), B)

    def params_for(k):
        p = random_affine_params(k, 1024, 1024)  # reference square frame
        return conjugate_affine(p, (1024, 1024), (H, W))

    legacy = jax.jit(jax.vmap(
        lambda im, k: affine_warp_legacy(im, params_for(k))))
    prod = jax.jit(jax.vmap(lambda im, k: affine_warp(im, params_for(k))))

    a = np.asarray(legacy(img, keys))
    b = np.asarray(prod(img, keys))
    err = np.abs(a - b).max()
    print(f"max |map_coordinates - row-gather| = {err:.3e}", flush=True)
    assert err == 0.0, err

    dt0 = timeit(legacy, img, keys)
    dt1 = timeit(prod, img, keys)
    px = B * H * W
    print(f"map_coordinates: {dt0 * 1e3:.3f} ms "
          f"({px / dt0 / 1e6:.1f} Mpix/s)", flush=True)
    print(f"row-gather:      {dt1 * 1e3:.3f} ms "
          f"({px / dt1 / 1e6:.1f} Mpix/s)  [{dt0 / dt1:.2f}x]", flush=True)


if __name__ == "__main__":
    main()
