#!/usr/bin/env python
"""Micro-bench the resnet head conv forms on the attached chip.

Times fwd+bwd of the 7x7 64->3 head at the bench activation shape for:
the direct VALID conv on a reflect-padded input, and the pad-free
strided s2d form at several (rh, rw) block shapes — validating the MXU
cost model in ops/s2d.py (taps x 128/lanes) before switching the
generator's default block.

All timings fence with a host read (block_until_ready returns early
through this environment's remote relay — see bench.py)."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from sggan_tpu.ops import conv2d, conv2d_init, reflect_pad
from sggan_tpu.ops import s2d

B, H, W, CIN, COUT, K = 16, 256, 512, 64, 3, 7
N_ITER = 30

key = jax.random.PRNGKey(0)
p = conv2d_init(key, K, K, CIN, COUT)
p = {"w": p["w"]}  # dead-bias elision parity with the generator head
x = jax.random.uniform(jax.random.fold_in(key, 1), (B, H, W, CIN),
                       jnp.bfloat16)


def bench(name, fn):
    f = jax.jit(jax.grad(lambda xx: jnp.sum(
        fn(xx).astype(jnp.float32) ** 2)))
    g = f(x)
    _ = float(jnp.sum(g.astype(jnp.float32)))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(N_ITER):
        g = f(x)
    _ = float(jnp.sum(g.astype(jnp.float32)))  # host-read fence
    dt = (time.perf_counter() - t0) / N_ITER * 1e3
    print(f"{name:28s} {dt:7.3f} ms/iter (fwd+bwd)", flush=True)
    return dt


results = {}
results["direct reflect+VALID"] = bench(
    "direct reflect+VALID",
    lambda xx: conv2d(p, reflect_pad(xx, 3), 1, "VALID", jnp.bfloat16))
for r in ((4, 4), (4, 8), (8, 4), (2, 8)):
    if s2d.applicable_reflect(x, p["w"], r=r):
        results[f"s2d {r}"] = bench(
            f"s2d reflect {r}",
            lambda xx, r=r: s2d.conv2d_reflect_s2d(p, xx, r=r,
                                                   compute_dtype=jnp.bfloat16))
model = {r: s2d._block_cost(K, COUT, *r) for r in ((4, 4), (4, 8), (8, 4),
                                                   (2, 8))}
print("cost model (taps*128/lanes):", model)
best = min((v, k) for k, v in results.items())
print("fastest:", best[1], f"{best[0]:.3f} ms")
