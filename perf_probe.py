#!/usr/bin/env python
"""Step-time attribution probes on the real chip (feeds PERF.md).

Each probe is one compiled program; timings fence with a host read.
  python perf_probe.py
"""

import time

import jax
import jax.numpy as jnp

from sggan_tpu.config import Config
from sggan_tpu.train import init_state, make_train_step
from sggan_tpu.train.step import build_step_fn
from sggan_tpu.models import generator_resnet
from sggan_tpu.utils import flops as F

H, W = 256, 512


def fence(x):
    return float(jnp.sum(x if not isinstance(x, dict) else x["gen_loss"]))


def timeit(fn, args, iters=12, warm=3):
    out = None
    for _ in range(warm):
        out = fn(*args)
    fence(out[1] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out[1] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / iters


def mk(cfg, b, key):
    hm, wm = cfg.mask_hw
    return {
        "real_a": jax.random.uniform(key, (b, H, W, 3)),
        "seg_a": jax.random.uniform(key, (b, H, W, 3)),
        "mask_a": jax.nn.one_hot(
            jax.random.randint(key, (b, hm, wm), 0, 34), 34),
    }


def cfg_(b, **kw):
    base = dict(image_height=H, image_width=W, batch_size=b,
                loss_mode="sggan", use_resnet=True, segment_class=34,
                compute_dtype="bfloat16", max_size=50, donate=False)
    base.update(kw)
    return Config(**base)


def main():
    print("backend:", jax.default_backend())
    key = jax.random.PRNGKey(0)
    lr = jnp.float32(1e-3)
    audit16 = F.sggan_train_step(H, W, 16)["step_flops"]

    # 1) batch scaling
    for b in (16, 32):
        cfg = cfg_(b)
        state = init_state(cfg, key)
        step = make_train_step(cfg, donate=False)
        batch = mk(cfg, b, key)
        dt = timeit(lambda s, ba, i: step(s, ba, lr, jax.random.PRNGKey(i)),
                    (state, batch, 0))
        print(f"step b={b}: {dt * 1e3:.2f} ms, {b / dt:.1f} img/s")

    # 2) scan of 8 steps in ONE program: removes per-step dispatch through
    # the remote relay; difference vs the loop = host/dispatch overhead
    cfg = cfg_(16)
    state = init_state(cfg, key)
    batch = mk(cfg, 16, key)
    body = build_step_fn(cfg)

    @jax.jit
    def scan8(state, batch, rng):
        def f(carry, i):
            s, _ = carry
            s, m = body(s, batch, lr, jax.random.fold_in(rng, i))
            return (s, m), ()
        (s, m), _ = jax.lax.scan(f, (state, {"gen_loss": jnp.float32(0),
                                             "disc_loss": jnp.float32(0)}),
                                 jnp.arange(8))
        return s, m

    dt = timeit(lambda s, ba, i: scan8(s, ba, jax.random.PRNGKey(i)),
                (state, batch, 0), iters=4) / 8
    print(f"step b=16 inside lax.scan(8): {dt * 1e3:.2f} ms/step, "
          f"{16 / dt:.1f} img/s, {audit16 / dt / 1e12:.1f} TF/s")

    # 3) no-pool step (pool cost)
    cfg = cfg_(16, max_size=0)
    state = init_state(cfg, key)
    step = make_train_step(cfg, donate=False)
    dt = timeit(lambda s, ba, i: step(s, ba, lr, jax.random.PRNGKey(i)),
                (state, batch, 0))
    print(f"step b=16 max_size=0: {dt * 1e3:.2f} ms")

    # 4) generator fwd and fwd+bwd rates at b=16
    params = generator_resnet.init(jax.random.PRNGKey(1))
    x = jax.random.uniform(key, (16, H, W, 3))
    gfwd = jax.jit(lambda p, x: generator_resnet.apply(
        p, x, compute_dtype=jnp.bfloat16))
    dt = timeit(gfwd, (params, x))
    gf = F.sggan_train_step(H, W, 16)
    print(f"gen fwd b=16: {dt * 1e3:.2f} ms = "
          f"{gf['gen_fwd_flops'] * 16 / dt / 1e12:.1f} TF/s")

    gboth = jax.jit(jax.grad(
        lambda p, x: jnp.sum(jnp.square(
            generator_resnet.apply(p, x, compute_dtype=jnp.bfloat16)))))
    dt = timeit(lambda p, x: gboth(p, x)["c1"]["w"], (params, x))
    print(f"gen fwd+bwd b=16: {dt * 1e3:.2f} ms = "
          f"{3 * gf['gen_fwd_flops'] * 16 / dt / 1e12:.1f} TF/s")

    # 5) wgrad microbench: dL/dW of the res-block conv
    xc = jax.random.uniform(key, (16, H // 4, W // 4, 256),
                            jnp.bfloat16)
    wc = jnp.ones((3, 3, 256, 256), jnp.bfloat16)

    def loss(w):
        y = jax.lax.conv_general_dilated(
            xc, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y.astype(jnp.float32) ** 2)

    wg = jax.jit(jax.grad(loss))
    dt = timeit(wg, (wc,))
    tf = 3 * 2 * 16 * (H // 4) * (W // 4) * 9 * 256 * 256 / dt / 1e12
    print(f"conv3x3 fwd+dgrad+wgrad: {dt * 1e3:.2f} ms = {tf:.1f} TF/s "
          "(3 conv-equivalents)")


if __name__ == "__main__":
    main()
