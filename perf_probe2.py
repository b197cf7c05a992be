#!/usr/bin/env python
"""Probe 2: in-step cost of the gradloss machinery and the N=3 output
conv, plus reformulations of the output conv."""

import time

import jax
import jax.numpy as jnp

from sggan_tpu.config import Config
from sggan_tpu.train import init_state, make_train_step

B, H, W = 16, 256, 512
KEY = jax.random.PRNGKey(0)


def timeit(fn, args, iters=12, warm=3, fence=None):
    for _ in range(warm):
        out = fn(*args)
    f = fence or (lambda o: float(jnp.sum(o)))
    f(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    f(out)
    return (time.perf_counter() - t0) / iters


def mk(cfg, b, key):
    hm, wm = cfg.mask_hw
    return {
        "real_a": jax.random.uniform(key, (b, H, W, 3)),
        "seg_a": jax.random.uniform(key, (b, H, W, 3)),
        "mask_a": jax.nn.one_hot(
            jax.random.randint(key, (b, hm, wm), 0, 34), 34),
    }


def step_time(**kw):
    base = dict(image_height=H, image_width=W, batch_size=B,
                loss_mode="sggan", use_resnet=True, segment_class=34,
                compute_dtype="bfloat16", max_size=50, donate=False)
    base.update(kw)
    cfg = Config(**base)
    state = init_state(cfg, KEY)
    step = make_train_step(cfg, donate=False)
    batch = mk(cfg, B, KEY)
    lr = jnp.float32(1e-3)
    return timeit(lambda s, b_, i: step(s, b_, lr, jax.random.PRNGKey(i)),
                  (state, batch, 0),
                  fence=lambda o: float(o[1]["gen_loss"]))


def main():
    print("backend:", jax.default_backend(), flush=True)
    t_full = step_time()
    print(f"step full: {t_full * 1e3:.2f} ms", flush=True)
    t_nolg = step_time(Lg_lambda=0.0)
    print(f"step Lg_lambda=0: {t_nolg * 1e3:.2f} ms "
          f"(gradloss in-step cost {1e3 * (t_full - t_nolg):.2f} ms)",
          flush=True)
    t_nol1 = step_time(Lg_lambda=0.0, L1_lambda=0.0)
    print(f"step Lg=L1=0: {t_nol1 * 1e3:.2f} ms", flush=True)

    # ---- output conv reformulations (64 -> 3, 7x7, full res) ----
    bf = jnp.bfloat16
    x = jax.random.uniform(KEY, (B, H + 6, W + 6, 64), bf)
    w = jax.random.uniform(KEY, (7, 7, 64, 3), bf)
    dims = ("NHWC", "HWIO", "NHWC")

    def conv_plain(x, w):
        return jax.lax.conv_general_dilated(x, w, (1, 1), "VALID",
                                            dimension_numbers=dims)

    dt = timeit(jax.jit(conv_plain), (x, w))
    print(f"outconv plain bf16: {dt * 1e3:.2f} ms", flush=True)

    # cout padded to 128
    w128 = jnp.zeros((7, 7, 64, 128), bf).at[..., :3].set(w)
    dt = timeit(jax.jit(lambda x, w_: conv_plain(x, w_)[..., :3]),
                (x, w128))
    print(f"outconv cout->128: {dt * 1e3:.2f} ms", flush=True)

    # f32 compute
    dt = timeit(jax.jit(lambda x, w_: conv_plain(
        x.astype(jnp.float32), w_.astype(jnp.float32))), (x, w))
    print(f"outconv f32: {dt * 1e3:.2f} ms", flush=True)

    # as 49 shifted (NHW,64)@(64,3) matmuls accumulated
    def conv_shift(x, w):
        acc = jnp.zeros((B, H, W, 3), jnp.float32)
        for di in range(7):
            for dj in range(7):
                patch = jax.lax.dynamic_slice(
                    x, (0, di, dj, 0), (B, H, W, 64))
                acc = acc + jnp.einsum(
                    "nhwc,co->nhwo", patch, w[di, dj],
                    preferred_element_type=jnp.float32)
        return acc

    dt = timeit(jax.jit(conv_shift), (x, w))
    print(f"outconv 49-shift einsum: {dt * 1e3:.2f} ms", flush=True)

    # spatial-to-depth: 2x2 space-to-depth then 4 strided convs? cheaper
    # equivalent: reshape W dim into lanes — (B,H+6, (W+6)*64) @ block...
    # simpler known trick: transpose to NCHW operand layout
    dt = timeit(jax.jit(lambda x, w_: jax.lax.conv_general_dilated(
        x.transpose(0, 3, 1, 2), w_.transpose(3, 2, 0, 1), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))), (x, w))
    print(f"outconv NCHW: {dt * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
