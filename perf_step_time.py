#!/usr/bin/env python
"""Time the plain jitted train step at the bench config (b=16 default).

The minimal on-chip A/B harness for step-level changes: warms up
(4 steps, covers the donation recompile), then times two independent
24-step runs, each fenced with a host read (block_until_ready returns
early through this container's remote relay — CLAUDE.md).

    python perf_step_time.py [batch] [steps]
"""

import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    from sggan_tpu.config import Config
    from sggan_tpu.train import init_state, make_train_step

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    h, w = 256, 512
    cfg = Config(image_height=h, image_width=w, batch_size=b,
                 loss_mode="sggan", use_resnet=True, segment_class=34,
                 compute_dtype="bfloat16", max_size=50, donate=True)
    key = jax.random.PRNGKey(0)
    state = init_state(cfg, key)
    step = make_train_step(cfg)
    hm, wm = cfg.mask_hw
    batch = {
        "real_a": jax.random.uniform(key, (b, h, w, 3)),
        "seg_a": jax.random.uniform(key, (b, h, w, 3)),
        "mask_a": jax.nn.one_hot(
            jax.random.randint(key, (b, hm, wm), 0, 34), 34),
    }
    lr = jnp.float32(1e-3)
    for i in range(4):
        state, m = step(state, batch, lr, jax.random.PRNGKey(i))
    float(m["gen_loss"])
    for run in range(2):
        t0 = time.perf_counter()
        for i in range(steps):
            state, m = step(state, batch, lr, jax.random.PRNGKey(i))
        float(m["gen_loss"])
        dt = (time.perf_counter() - t0) / steps
        print(f"run {run}: {dt * 1e3:.2f} ms/step, {b / dt:.2f} img/s",
              flush=True)


if __name__ == "__main__":
    main()
