#!/usr/bin/env python
"""On-chip fwd / fwd+bwd table: fused Pallas conv3x3+IN(+relu) kernel
(ops/pallas_conv_in.py) vs the default XLA composition
(conv2d_reflect -> one-pass custom-VJP instance_norm) — the measurement
VERDICT r3 item 1 demands at the two step-dominating shapes:

  (16,  64, 128, 256)  — the resblock body (9x per generator forward)
  (16, 256, 512,  64)  — the wide/narrow-channel encoder shape

Numerics cross-check runs on-chip first (max |diff| printed) so the
table is of a verified-equivalent kernel.  All timings fence with a
host read (block_until_ready returns early through this environment's
remote relay — CLAUDE.md).

Usage: python perf_conv_in.py [iters]   (prints one JSON line)
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, args, iters, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fence(out)
    return (time.perf_counter() - t0) / iters


def _fence(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def main():
    from sggan_tpu.ops import pallas_conv_in as pci
    from sggan_tpu.ops.norm import instance_norm_init

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    on_tpu = jax.default_backend() in ("tpu", "axon")
    cd = jnp.bfloat16 if on_tpu else jnp.float32
    shapes = [(16, 64, 128, 256, 256), (16, 256, 512, 64, 64)]
    interp = not on_tpu  # CPU smoke: interpret mode
    if not on_tpu:
        shapes = [(2, 16, 16, 8, 8)]
        iters = 2

    rows = []
    for (n, h, w, cin, cout) in shapes:
        k = jax.random.PRNGKey(0)
        x = jax.random.normal(k, (n, h, w, cin), cd)
        wk = (jax.random.normal(k, (3, 3, cin, cout), jnp.float32)
              / np.sqrt(9 * cin))
        inp = instance_norm_init(cout)
        gflop = 2 * 9 * cin * cout * n * h * w / 1e9

        pallas_f = jax.jit(lambda x, wk, g, b: pci.conv3_in(
            x, wk, g, b, act="relu", interpret=interp))
        pallas_f_i2c = jax.jit(lambda x, wk, g, b: pci.conv3_in(
            x, wk, g, b, act="relu", interpret=interp, im2col=True))
        xla_f = jax.jit(lambda x, wk, g, b: pci.conv3_in_xla(
            {"w": wk}, {"gamma": g, "beta": b}, x, act="relu"))

        def conv_only(x, wk, g, b):
            from sggan_tpu.ops.layers import conv2d_reflect
            return conv2d_reflect({"w": wk}, x, x.dtype, bias=False)

        xla_conv = jax.jit(conv_only)

        def loss_p(x, wk, g, b):
            y = pci.conv3_in(x, wk, g, b, act="relu", interpret=interp)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        def loss_x(x, wk, g, b):
            y = pci.conv3_in_xla({"w": wk}, {"gamma": g, "beta": b}, x,
                                 act="relu")
            return jnp.sum(y.astype(jnp.float32) ** 2)

        pallas_g = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2, 3)))
        xla_g = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2, 3)))

        args = (x, wk, inp["gamma"], inp["beta"])
        row = {"shape": [n, h, w, cin, cout]}
        # on-chip numerics cross-check before timing
        try:
            yp = np.asarray(pallas_f(*args), np.float32)
            yx = np.asarray(xla_f(*args), np.float32)
            dmax = float(np.max(np.abs(yp - yx)))
            print(f"shape {n}x{h}x{w}x{cin}->{cout}: max|pallas-xla| = "
                  f"{dmax:.3e}", file=sys.stderr, flush=True)
            assert dmax < 0.05, "kernel/XLA forward mismatch"
            row["max_abs_diff"] = dmax
        except Exception as e:  # noqa: BLE001 — record, keep measuring
            row["check_error"] = str(e).splitlines()[0][:200]
            print(f"shape {n}x{h}x{w}x{cin}->{cout}: CHECK FAILED "
                  f"{row['check_error']}", file=sys.stderr, flush=True)

        for name, fn, fl in [("fwd_pallas", pallas_f, gflop),
                             ("fwd_pallas_i2c", pallas_f_i2c, gflop),
                             ("fwd_xla", xla_f, gflop),
                             ("fwd_xla_conv_only", xla_conv, gflop),
                             ("fwdbwd_pallas", pallas_g, 3 * gflop),
                             ("fwdbwd_xla", xla_g, 3 * gflop)]:
            try:
                dt = bench(fn, args, iters)
            except Exception as e:  # noqa: BLE001 — one variant failing
                # to compile must not void the rest of the table
                row[name + "_error"] = str(e).splitlines()[0][:200]
                print(f"  {name:>16}: FAILED {row[name + '_error']}",
                      file=sys.stderr, flush=True)
                continue
            row[name + "_ms"] = round(dt * 1e3, 3)
            row[name + "_tfs"] = round(fl / dt / 1e3, 1)
            print(f"  {name:>16}: {dt * 1e3:7.3f} ms  "
                  f"({fl / dt / 1e3:6.1f} TF/s)", file=sys.stderr,
                  flush=True)
        rows.append(row)

    print(json.dumps({"backend": jax.default_backend(),
                      "compute_dtype": str(cd.__name__), "rows": rows}))


if __name__ == "__main__":
    main()
