#!/usr/bin/env python
"""Measure data-parallel sharding-plumbing overhead (VERDICT r3 item 3a).

PERF.md's scale-out claim ("reaching 1500 img/s needs ~12 chips of
data-parallel scale-out — which is what parallel/dp.py provides") rests on
the dp step costing the same as the plain jitted step per chip.  This
script measures that directly on the attached chip: the plain
`make_train_step` vs `make_dp_train_step` on a 1-device mesh, identical
config/batch/state, both fenced with a host read (block_until_ready
returns early through this container's remote relay — CLAUDE.md).

Usage:  python perf_dp_overhead.py [batch] [steps]
Prints one JSON line with both ms/step numbers and the ratio.
"""

import json
import os
import sys
import time

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # sitecustomize bakes JAX_PLATFORMS=axon into the live config; the env
    # var alone does not stick (CLAUDE.md) — override through the config.
    import jax
    jax.config.update("jax_platforms", "cpu")


def time_step(step, state, batch, lr, steps):
    import jax
    for i in range(4):
        state, m = step(state, batch, lr, jax.random.PRNGKey(i))
    float(m["gen_loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = step(state, batch, lr, jax.random.PRNGKey(i))
    float(m["gen_loss"])
    return (time.perf_counter() - t0) / steps, state


def main():
    import jax
    import jax.numpy as jnp

    from sggan_tpu.config import Config
    from sggan_tpu.parallel import dp, mesh as meshlib
    from sggan_tpu.train import init_state, make_train_step

    on_tpu = jax.default_backend() in ("tpu", "axon")
    b = int(sys.argv[1]) if len(sys.argv) > 1 else (16 if on_tpu else 2)
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else (24 if on_tpu else 2)
    h, w = (256, 512) if on_tpu else (64, 64)

    cfg = Config(image_height=h, image_width=w, batch_size=b,
                 loss_mode="sggan", use_resnet=True, segment_class=34,
                 compute_dtype="bfloat16" if on_tpu else "float32",
                 max_size=50, donate=True)
    key = jax.random.PRNGKey(0)
    hm, wm = cfg.mask_hw
    batch = {
        "real_a": jax.random.uniform(key, (b, h, w, 3)),
        "seg_a": jax.random.uniform(key, (b, h, w, 3)),
        "mask_a": jax.nn.one_hot(
            jax.random.randint(key, (b, hm, wm), 0, 34), 34),
    }
    lr = jnp.float32(1e-3)

    plain_dt, _ = time_step(make_train_step(cfg), init_state(cfg, key),
                            batch, lr, steps)
    print(f"plain jit   b={b}: {plain_dt * 1e3:8.2f} ms/step "
          f"({b / plain_dt:.2f} img/s)", file=sys.stderr, flush=True)

    m = meshlib.make_mesh(data=1)
    dp_state = dp.replicate(init_state(cfg, key), m)
    dp_batch = dp.shard_batch(batch, m)
    dp_dt, _ = time_step(dp.make_dp_train_step(cfg, m), dp_state,
                         dp_batch, lr, steps)
    print(f"dp mesh(1)  b={b}: {dp_dt * 1e3:8.2f} ms/step "
          f"({b / dp_dt:.2f} img/s)", file=sys.stderr, flush=True)

    print(json.dumps({
        "batch": b, "steps": steps,
        "plain_ms_per_step": round(plain_dt * 1e3, 2),
        "dp1_ms_per_step": round(dp_dt * 1e3, 2),
        "dp_over_plain": round(dp_dt / plain_dt, 4),
    }))


if __name__ == "__main__":
    main()
