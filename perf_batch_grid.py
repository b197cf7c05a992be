#!/usr/bin/env python
"""One-off probe: does the scan8 train-step chunk beat the 143.3 img/s
headline at batch sizes above bench.py's (16, 24) grid?

Reuses the exact bench.py scan-chunk shape (build_step_fn + lax.scan(8),
donated carry, host-read fenced).  Prints one stderr line per batch.
"""

import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    from sggan_tpu.config import Config
    from sggan_tpu.train import init_state
    from sggan_tpu.train.step import build_step_fn

    on_tpu = jax.default_backend() in ("tpu", "axon")
    h, w = (256, 512) if on_tpu else (64, 64)
    K = 8
    steps = 24 if on_tpu else 2

    for b in ((32, 48) if on_tpu else (2,)):
        cfg = Config(image_height=h, image_width=w, batch_size=b,
                     loss_mode="sggan", use_resnet=True, segment_class=34,
                     compute_dtype="bfloat16" if on_tpu else "float32",
                     max_size=50, donate=True)
        key = jax.random.PRNGKey(0)
        state = init_state(cfg, key)
        body = build_step_fn(cfg)
        hm, wm = cfg.mask_hw
        batch = {
            "real_a": jax.random.uniform(key, (b, h, w, 3)),
            "seg_a": jax.random.uniform(key, (b, h, w, 3)),
            "mask_a": jax.nn.one_hot(
                jax.random.randint(key, (b, hm, wm), 0, 34), 34),
        }
        lr = jnp.float32(1e-3)

        def chunk(state, key, batch, lr):
            def one(carry, _):
                st, ky = carry
                ky, ks = jax.random.split(ky)
                st, m = body(st, batch, lr, ks)
                return (st, ky), m
            (state, key), ms = jax.lax.scan(one, (state, key), None,
                                            length=K)
            return state, key, ms

        chunk = jax.jit(chunk, donate_argnums=(0,))
        try:
            k = jax.random.PRNGKey(1)
            for _ in range(2):
                state, k, ms = chunk(state, k, batch, lr)
            float(ms["gen_loss"][-1])
            n_chunks = max(steps // K, 2)
            t0 = time.perf_counter()
            for _ in range(n_chunks):
                state, k, ms = chunk(state, k, batch, lr)
            float(ms["gen_loss"][-1])
            dt = (time.perf_counter() - t0) / (n_chunks * K)
            print(f"batch {b} scan_steps={K}: {b / dt:.2f} img/s "
                  f"({dt * 1e3:.2f} ms/step)", file=sys.stderr)
        except Exception as e:
            print(f"batch {b} failed: {type(e).__name__}: {e}"[:300],
                  file=sys.stderr)
        del state, batch, chunk


if __name__ == "__main__":
    main()
