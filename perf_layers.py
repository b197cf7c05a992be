#!/usr/bin/env python
"""Per-layer timing sweep of the resnet generator at 256x512 b=16 —
locates the gap between the step's 86 TF/s and XLA's 110 TF/s conv rate.
"""

import time

import jax
import jax.numpy as jnp

from sggan_tpu import ops

B, H, W = 16, 256, 512
KEY = jax.random.PRNGKey(0)


def timeit(fn, args, iters=12, warm=3):
    for _ in range(warm):
        out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def report(name, dt, gf):
    print(f"{name}: {dt * 1e3:.3f} ms, {gf:.1f} GF -> "
          f"{gf / dt / 1e9:.1f} TF/s", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    bf = jnp.bfloat16

    cases = [
        # (name, in_shape(NHWC), k, cout, stride, pad)
        ("c7s1_in  3->64 @256x512", (B, H + 6, W + 6, 3), 7, 64, 1, "VALID"),
        ("d128 64->128 s2 @256x512", (B, H, W, 64), 3, 128, 2, "SAME"),
        ("d256 128->256 s2 @128x256", (B, H // 2, W // 2, 128), 3, 256, 2,
         "SAME"),
        ("res 256->256 @64x128+pad", (B, H // 4 + 2, W // 4 + 2, 256), 3,
         256, 1, "VALID"),
        ("out 64->3 c7s1 @256x512", (B, H + 6, W + 6, 64), 7, 3, 1,
         "VALID"),
    ]
    for name, shp, k, cout, s, pad in cases:
        cin = shp[-1]
        x = jax.random.uniform(KEY, shp, bf)
        w = jax.random.uniform(KEY, (k, k, cin, cout), bf)
        fn = jax.jit(lambda x, w, s=s, pad=pad: jax.lax.conv_general_dilated(
            x, w, (s, s), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")))
        dt = timeit(fn, (x, w))
        oh = (shp[1] if pad == "SAME" else shp[1] - k + 1) // s
        ow = (shp[2] if pad == "SAME" else shp[2] - k + 1) // s
        gf = 2 * B * oh * ow * k * k * cin * cout / B / 1e9 * B
        report(name, dt, gf)

    # convT u128: 256->128 s2 @64x128 -> 128x256
    x = jax.random.uniform(KEY, (B, H // 4, W // 4, 256), bf)
    w = jax.random.uniform(KEY, (3, 3, 128, 256), bf)
    fn = jax.jit(lambda x, w: jax.lax.conv_transpose(
        x, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True))
    dt = timeit(fn, (x, w))
    gf = 2 * B * (H // 2) * (W // 2) * 9 * 256 * 128 / 4 / 1e9
    report("u128 convT 256->128 s2", dt, gf)

    # instance norm (XLA path) at the two big shapes
    for shp in [(B, H // 4, W // 4, 256), (B, H, W, 64)]:
        x = jax.random.uniform(KEY, shp, bf)
        p = ops.instance_norm_init(shp[-1])
        fn = jax.jit(lambda p, x: ops.instance_norm(p, x, act="relu",
                                                    use_pallas=False))
        dt = timeit(fn, (p, x))
        nbytes = 2 * x.size * 2 + x.size * 2
        print(f"IN+relu {shp}: {dt * 1e3:.3f} ms "
              f"({nbytes / dt / 1e9:.0f} GB/s eff)", flush=True)

    # reflect pad at full res
    x = jax.random.uniform(KEY, (B, H, W, 64), bf)
    fn = jax.jit(lambda x: ops.reflect_pad(x, 3))
    dt = timeit(fn, (x,))
    print(f"reflect_pad3 (B,{H},{W},64): {dt * 1e3:.3f} ms", flush=True)

    # boundary weight map + tf_deriv (gradloss machinery) at full res
    from sggan_tpu.ops.deriv import seg_boundary_weight, tf_deriv
    seg = jax.random.uniform(KEY, (B, H, W, 3))
    fn = jax.jit(seg_boundary_weight)
    dt = timeit(fn, (seg,))
    print(f"seg_boundary_weight: {dt * 1e3:.3f} ms", flush=True)
    fake = jax.random.uniform(KEY, (B, H, W, 3))
    fn = jax.jit(lambda a: jnp.abs(tf_deriv(a)))
    dt = timeit(fn, (fake,))
    print(f"tf_deriv(|.|): {dt * 1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
