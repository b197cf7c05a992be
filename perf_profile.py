#!/usr/bin/env python
"""Probe 3: (a) jax.profiler through the relay, parsing the perfetto
trace ourselves; (b) generator fwd/fwd+bwd with the final c7s1 64->3 conv
ablated, to bound its true in-step cost."""

import glob
import gzip
import json
import time

import jax
import jax.numpy as jnp

from sggan_tpu.models import generator_resnet
from sggan_tpu.ops import conv2d, instance_norm, reflect_pad, tanh

B, H, W = 16, 256, 512
KEY = jax.random.PRNGKey(0)


def timeit(fn, args, iters=12, warm=3):
    for _ in range(warm):
        out = fn(*args)
    float(jnp.sum(out if not isinstance(out, dict) else out["c1"]["w"]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out if not isinstance(out, dict) else out["c1"]["w"]))
    return (time.perf_counter() - t0) / iters


def apply_no_out(params, x):
    """generator_resnet.apply minus the final reflect-pad + c7s1 conv
    (probe-only ablation)."""
    cd = jnp.bfloat16
    y = x.astype(cd)
    y = reflect_pad(y, 3)
    y = conv2d(params["c1"], y, 1, "VALID", cd)
    y = instance_norm(params["c1_in"], y, act="relu")
    y = conv2d(params["c2"], y, 2, "SAME", cd)
    y = instance_norm(params["c2_in"], y, act="relu")
    y = conv2d(params["c3"], y, 2, "SAME", cd)
    y = instance_norm(params["c3_in"], y, act="relu")
    for i in range(9):
        b = params[f"r{i + 1}"]
        z = reflect_pad(y, 1)
        z = conv2d(b["conv1"], z, 1, "VALID", cd)
        z = instance_norm(b["in1"], z, act="relu")
        z = reflect_pad(z, 1)
        z = conv2d(b["conv2"], z, 1, "VALID", cd)
        z = instance_norm(b["in2"], z)
        y = z + y
    from sggan_tpu.ops import conv2d_transpose
    y = conv2d_transpose(params["d1"], y, 2, "SAME", cd)
    y = instance_norm(params["d1_in"], y, act="relu")
    y = conv2d_transpose(params["d2"], y, 2, "SAME", cd)
    y = instance_norm(params["d2_in"], y, act="relu")
    return tanh(y.astype(jnp.float32))


def main():
    print("backend:", jax.default_backend(), flush=True)
    params = generator_resnet.init(jax.random.PRNGKey(1))
    x = jax.random.uniform(KEY, (B, H, W, 3))

    full = jax.jit(lambda p, x: generator_resnet.apply(
        p, x, compute_dtype=jnp.bfloat16))
    noout = jax.jit(lambda p, x: apply_no_out(p, x))
    dt_f = timeit(full, (params, x))
    dt_n = timeit(noout, (params, x))
    print(f"gen fwd full: {dt_f * 1e3:.2f} ms; no-out-conv: "
          f"{dt_n * 1e3:.2f} ms -> out conv fwd in-program "
          f"{(dt_f - dt_n) * 1e3:.2f} ms", flush=True)

    gfull = jax.jit(jax.grad(lambda p, x: jnp.sum(jnp.square(
        generator_resnet.apply(p, x, compute_dtype=jnp.bfloat16)))))
    gnoout = jax.jit(jax.grad(lambda p, x: jnp.sum(jnp.square(
        apply_no_out(p, x)))))
    dt_fb = timeit(gfull, (params, x))
    dt_nb = timeit(gnoout, (params, x))
    print(f"gen fwd+bwd full: {dt_fb * 1e3:.2f} ms; no-out-conv: "
          f"{dt_nb * 1e3:.2f} ms -> out conv fwd+bwd in-program "
          f"{(dt_fb - dt_nb) * 1e3:.2f} ms", flush=True)

    # ---- profiler attempt ----
    try:
        with jax.profiler.trace("/tmp/jaxtrace"):
            for i in range(3):
                out = full(params, x)
            float(jnp.sum(out))
        traces = glob.glob("/tmp/jaxtrace/**/*.trace.json.gz",
                           recursive=True)
        print("trace files:", traces, flush=True)
        if traces:
            with gzip.open(traces[-1], "rt") as f:
                data = json.load(f)
            evs = [e for e in data.get("traceEvents", [])
                   if e.get("ph") == "X" and e.get("dur")]
            # keep device-side events only (pid names containing TPU)
            tot = {}
            for e in evs:
                tot[e["name"]] = tot.get(e["name"], 0) + e["dur"]
            top = sorted(tot.items(), key=lambda kv: -kv[1])[:25]
            for name, us in top:
                print(f"  {us / 1e3:9.2f} ms  {name[:100]}", flush=True)
    except Exception as e:
        print(f"profiler unavailable: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
