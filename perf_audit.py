#!/usr/bin/env python
"""Perf audit: FLOP-consistent MFU numbers for the train step (PERF.md).

Modes:
  python perf_audit.py flops   # CPU: analytic count vs XLA cost_analysis
  python perf_audit.py tpu     # real chip: GEMM/conv roofline + step MFU

All timings fence with a host read (see CLAUDE.md: block_until_ready
returns early through the remote relay).
"""

import sys
import time


H, W, B = 256, 512, 16


def _flops_cross_check():
    """Analytic conv count vs XLA's own cost analysis (CPU compile)."""
    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sggan_tpu.config import Config
    from sggan_tpu.train import init_state, make_train_step
    from sggan_tpu.utils import flops as F

    audit = F.sggan_train_step(H, W, B)
    for k, v in audit.items():
        print(f"analytic {k}: {v / 1e9:.2f} GF")

    cfg = Config(image_height=H, image_width=W, batch_size=B,
                 loss_mode="sggan", use_resnet=True, segment_class=34,
                 compute_dtype="float32", max_size=50, donate=False)
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, donate=False)
    hm, wm = cfg.mask_hw
    batch = {
        "real_a": jnp.zeros((B, H, W, 3)),
        "seg_a": jnp.zeros((B, H, W, 3)),
        "mask_a": jnp.zeros((B, hm, wm, 34)),
    }
    lowered = step.lower(state, batch, jnp.float32(1e-3),
                         jax.random.PRNGKey(1))
    cost = lowered.compile().cost_analysis()
    xla_flops = cost.get("flops", float("nan"))
    print(f"xla cost_analysis flops: {xla_flops / 1e9:.2f} GF "
          f"(ratio vs analytic: {xla_flops / audit['step_flops']:.3f})")


def _bench(fn, args, iters, warmup=3):
    import jax.numpy as jnp
    out = None
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / iters


def _tpu_audit():
    import jax
    import jax.numpy as jnp
    print("backend:", jax.default_backend(), jax.devices())

    # ---- GEMM roofline, bf16 (the conv-as-implicit-GEMM shapes) ----
    for (m, k, n) in [(B * (H // 4) * (W // 4), 2304, 256),
                      (B * (H // 4) * (W // 4), 256, 256),
                      (8192, 8192, 8192),
                      (16384, 2048, 2048)]:
        a = jnp.ones((m, k), jnp.bfloat16)
        b = jnp.ones((k, n), jnp.bfloat16)
        dt = _bench(jax.jit(lambda a, b: jax.lax.dot(a, b)), (a, b), 16)
        tf = 2 * m * k * n / dt / 1e12
        print(f"GEMM {m}x{k}x{n} bf16: {dt * 1e3:.3f} ms = {tf:.1f} TF/s")

    # ---- the res-block conv at train shapes, bf16 ----
    x = jnp.ones((B, H // 4, W // 4, 256), jnp.bfloat16)
    w = jnp.ones((3, 3, 256, 256), jnp.bfloat16)

    @jax.jit
    def conv_chain(x, w):
        def body(i, y):
            y = jax.lax.conv_general_dilated(
                y, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return (y * 1e-3).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, 8, body, x)

    dt = _bench(conv_chain, (x, w), 8) / 8
    tf = 2 * B * (H // 4) * (W // 4) * 9 * 256 * 256 / dt / 1e12
    print(f"conv3x3 SAME 256ch {B}x{H // 4}x{W // 4} bf16: "
          f"{dt * 1e3:.3f} ms = {tf:.1f} TF/s")

    # ---- the full train step ----
    from sggan_tpu.config import Config
    from sggan_tpu.train import init_state, make_train_step
    from sggan_tpu.utils import flops as F

    cfg = Config(image_height=H, image_width=W, batch_size=B,
                 loss_mode="sggan", use_resnet=True, segment_class=34,
                 compute_dtype="bfloat16", max_size=50, donate=True)
    key = jax.random.PRNGKey(0)
    state = init_state(cfg, key)
    step = make_train_step(cfg)
    hm, wm = cfg.mask_hw
    batch = {
        "real_a": jax.random.uniform(key, (B, H, W, 3)),
        "seg_a": jax.random.uniform(key, (B, H, W, 3)),
        "mask_a": jax.nn.one_hot(
            jax.random.randint(key, (B, hm, wm), 0, 34), 34),
    }
    lr = jnp.float32(1e-3)
    for i in range(4):
        state, m = step(state, batch, lr, jax.random.PRNGKey(i))
    float(m["gen_loss"])
    steps = 24
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = step(state, batch, lr, jax.random.PRNGKey(i))
    float(m["gen_loss"])
    dt = (time.perf_counter() - t0) / steps

    audit = F.sggan_train_step(H, W, B)
    flops = audit["step_flops"]
    try:  # the compiled program's own count, if the relay exposes it
        cost = step.lower(state, batch, lr,
                          jax.random.PRNGKey(0)).compile().cost_analysis()
        xla_flops = cost.get("flops", 0.0)
        print(f"TPU cost_analysis flops: {xla_flops / 1e9:.1f} GF/step")
        if xla_flops > 0:
            flops = xla_flops
    except Exception as e:
        print(f"cost_analysis unavailable: {type(e).__name__}")
    step_tf = flops / dt / 1e12
    print(f"train step b={B}: {dt * 1e3:.2f} ms = {B / dt:.1f} img/s, "
          f"{flops / 1e9:.1f} GF/step (analytic "
          f"{audit['step_flops'] / 1e9:.1f}) -> {step_tf:.1f} TF/s "
          f"sustained, MFU vs 197 TF/s nominal = {step_tf / 197:.1%}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "flops"
    if mode == "flops":
        _flops_cross_check()
    else:
        _tpu_audit()
