#!/usr/bin/env python
"""Cycle-step remat probe: the b-sweep (perf_cycle_trace.py) found b=8
optimal (326 ms), b=12 collapsed to 723 ms and b=16 failed to compile —
an HBM ceiling (the cycle program holds ~6 generator forwards' worth of
activations).  `--remat` halves the generator activation live set for
~8% recompute (PERF.md); if the collapse is spill-driven, remat at
b=12/16 may beat the b=8 headline.  Measures cycle step with remat at
given batches.

    python perf_cycle_remat.py [batches...]    # default 8 12 16
"""

import sys
import time

import jax
import jax.numpy as jnp

from sggan_tpu.config import Config
from sggan_tpu.train.cycle import init_cycle_state, make_cycle_train_step

H, W = 256, 512


def main():
    batches = [int(a) for a in sys.argv[1:]] or [8, 12, 16]
    lr = jnp.float32(2e-4)
    for b in batches:
        try:
            cfg = Config(image_height=H, image_width=W, batch_size=b,
                         loss_mode="cycle", use_resnet=True,
                         segment_class=34, compute_dtype="bfloat16",
                         max_size=50, donate=True, remat=True)
            key = jax.random.PRNGKey(0)
            state = init_cycle_state(cfg, key)
            step = make_cycle_train_step(cfg)
            hm, wm = cfg.mask_hw
            mk = lambda k: jax.random.uniform(jax.random.PRNGKey(k),
                                              (b, H, W, 3))
            mmask = lambda k: jax.nn.one_hot(jax.random.randint(
                jax.random.PRNGKey(k), (b, hm, wm), 0, 34), 34)
            batch = {"real_a": mk(0), "seg_a": mk(1), "mask_a": mmask(2),
                     "real_b": mk(3), "seg_b": mk(4), "mask_b": mmask(5)}
            for i in range(4):
                state, m = step(state, batch, lr, jax.random.PRNGKey(i))
            float(m["gen_loss"])
            n = 12
            t0 = time.perf_counter()
            for i in range(n):
                state, m = step(state, batch, lr, jax.random.PRNGKey(i))
            float(m["gen_loss"])
            dt = (time.perf_counter() - t0) / n
            print(f"cycle+remat batch {b}: {b / dt:.2f} img/s "
                  f"({dt * 1e3:.2f} ms/step)", flush=True)
            del state, batch
        except Exception as e:
            print(f"cycle+remat batch {b} failed: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
