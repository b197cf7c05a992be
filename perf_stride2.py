#!/usr/bin/env python
"""Settle the last named SOL item with silicon: stride-2 conv vs its
s2d + dense-conv reformulation (TODO.md round-5 candidate).

The round-4 trace prices 1.06 ms/step of `reverse` ops as XLA's dgrad
lowering of the two stride-2 encoder convs (input-dilated gradient =>
full-activation spatial reversal).  The only named fix is reformulating
stride-2 conv as space-to-depth + a dense stride-1 conv: dgrad of a
stride-1 conv has no dilation and no reverses — but the 3x3 taps embed
into a 2x2 kernel over 4C channels (16C taps vs 9C, +78% FLOPs) and the
s2d relayout itself costs full-tensor HBM passes with transposed
gradients.  This measures fwd+bwd of both forms in isolation at the two
encoder shapes (bench config, b=16 at 256x512), host-read fenced.

Equivalence: y_s2d == y_strided exactly (same taps, zero weights on the
phantom positions; asserted below at f32 tolerance before timing).

    python perf_stride2.py
"""

import time

import jax
import jax.numpy as jnp
from jax import lax

DIMS = ("NHWC", "HWIO", "NHWC")


def strided(w3, x):
    return lax.conv_general_dilated(x, w3, (2, 2), "SAME",
                                    dimension_numbers=DIMS)


def s2d_form(w3, x):
    n, h, wd, c = x.shape
    # s2d 2x2: (N, H/2, W/2, 4C) with channel block order (a, b, c)
    xs = x.reshape(n, h // 2, 2, wd // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(n, h // 2, wd // 2, 4 * c)
    # Embed the 3x3 taps into (2, 2, 4C, Cout): tap (di, dj) lands at
    # kernel position (di//2, dj//2), channel sub-block (di%2, dj%2).
    cout = w3.shape[-1]
    w16 = jnp.zeros((2, 2, 2, 2, c, cout), w3.dtype)
    for di in range(3):
        for dj in range(3):
            w16 = w16.at[di // 2, dj // 2, di % 2, dj % 2].set(
                w3[di, dj])
    w16 = w16.reshape(2, 2, 4 * c, cout)
    # SAME for k=3/stride 2 on even H pads (0, 1): in s2d space that is
    # one phantom block row/col at the high edge.
    return lax.conv_general_dilated(xs, w16, (1, 1), [(0, 1), (0, 1)],
                                    dimension_numbers=DIMS)


def bench(fn, w3, x, tag, iters=48):
    tgt_shape = jax.eval_shape(fn, w3, x).shape
    tgt = jax.random.normal(jax.random.PRNGKey(9), tgt_shape, x.dtype)

    def loss(w3, x):
        return jnp.sum((fn(w3, x) - tgt).astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, (0, 1)))
    dw, dx = g(w3, x)
    float(jnp.sum(dw.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        dw, dx = g(w3, x)
    float(jnp.sum(dw.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    print(f"  {tag}: {dt * 1e3:.3f} ms fwd+bwd", flush=True)
    return dt


def main():
    cd = jnp.bfloat16
    for (n, h, wd, c, cout) in ((16, 256, 512, 64, 128),
                                (16, 128, 256, 128, 256)):
        print(f"shape ({n},{h},{wd},{c})->{cout} stride 2:", flush=True)
        k = jax.random.PRNGKey(0)
        x = jax.random.normal(k, (n, h, wd, c), cd)
        w3 = jax.random.normal(jax.random.fold_in(k, 1),
                               (3, 3, c, cout), cd) * 0.05
        ya = jax.jit(strided)(w3, x)
        yb = jax.jit(s2d_form)(w3, x)
        err = float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                    - yb.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(ya.astype(jnp.float32))))
        print(f"  max |strided - s2d| = {err:.2e} (out scale {scale:.2f})",
              flush=True)
        # bf16 outputs: different tap accumulation order => a few ulp
        # (f32 CPU check in-session measured ~1e-7 relative)
        assert err < 4 * 2.0 ** -8 * scale, "forms disagree"
        ta = bench(strided, w3, x, "strided  ")
        tb = bench(s2d_form, w3, x, "s2d+dense")
        print(f"  ratio s2d/strided = {tb / ta:.3f}", flush=True)


if __name__ == "__main__":
    main()
