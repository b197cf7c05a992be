#!/usr/bin/env python
"""Cycle-step perf rigor (VERDICT r4 item 1): give the north star's named
train step (BASELINE config #3 — cycle + identity + semantic-aware
gradient-weighted losses) the same silicon treatment the sggan step got.

Does, in one serial TPU process:
  1. batch-size sweep of the jitted cycle step at 256x512 bf16
     (donated state, pool 50) — host-read fenced timing;
  2. lax.scan K-step chunk timing at the best batch (the trainer's
     `--scan_steps` dispatch form);
  3. a 3-step profiler trace at the best batch, left in /tmp/cycle_trace
     for perf_sol.py's trace-derived SOL (same category accounting as
     the sggan step's: convs at their measured in-step rate, every other
     op at its HBM-bandwidth bound).

Reference anchor: the cycle machinery the reference built but never
wired (utils.py:27-53 ImagePool, main.py:29 which_direction,
model.py:114-133 cycle/identity losses).

    python perf_cycle_trace.py [batches...]     # default 4 8 12 16
then
    python perf_sol.py /tmp/cycle_trace <best_b>
"""

import sys
import time

import jax
import jax.numpy as jnp

from sggan_tpu.config import Config
from sggan_tpu.train.cycle import init_cycle_state, make_cycle_train_step

H, W = 256, 512


def build(b):
    cfg = Config(image_height=H, image_width=W, batch_size=b,
                 loss_mode="cycle", use_resnet=True, segment_class=34,
                 compute_dtype="bfloat16", max_size=50, donate=True)
    key = jax.random.PRNGKey(0)
    state = init_cycle_state(cfg, key)
    step = make_cycle_train_step(cfg)
    hm, wm = cfg.mask_hw
    mk = lambda k: jax.random.uniform(jax.random.PRNGKey(k), (b, H, W, 3))
    mmask = lambda k: jax.nn.one_hot(jax.random.randint(
        jax.random.PRNGKey(k), (b, hm, wm), 0, 34), 34)
    batch = {"real_a": mk(0), "seg_a": mk(1), "mask_a": mmask(2),
             "real_b": mk(3), "seg_b": mk(4), "mask_b": mmask(5)}
    return cfg, state, step, batch


def main():
    batches = [int(a) for a in sys.argv[1:]] or [4, 8, 12, 16]
    lr = jnp.float32(2e-4)
    best, best_b = 0.0, None
    for b in batches:
        try:
            cfg, state, step, batch = build(b)
            for i in range(4):
                state, m = step(state, batch, lr, jax.random.PRNGKey(i))
            float(m["gen_loss"])  # host read: the only trustworthy fence
            n = 12
            t0 = time.perf_counter()
            for i in range(n):
                state, m = step(state, batch, lr, jax.random.PRNGKey(i))
            float(m["gen_loss"])
            dt = (time.perf_counter() - t0) / n
        except Exception as e:
            print(f"batch {b} failed: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            break
        ips = b / dt
        print(f"cycle batch {b}: {ips:.2f} img/s ({dt * 1e3:.2f} ms/step)",
              flush=True)
        if ips > best:
            best, best_b = ips, b
        del state, batch

    # scan-chunk form at the best batch (the trainer's dispatch shape)
    b = best_b
    cfg, state, step, batch = build(b)
    from sggan_tpu.train.cycle import build_cycle_step_fn
    body = build_cycle_step_fn(cfg)
    K = 8

    def chunk(state, key, batch, lr):
        def one(carry, _):
            st, ky = carry
            ky, ks = jax.random.split(ky)
            st, m = body(st, batch, lr, ks)
            return (st, ky), m
        (state, key), ms = jax.lax.scan(one, (state, key), None, length=K)
        return state, key, ms

    try:
        chunk = jax.jit(chunk, donate_argnums=(0,))
        key = jax.random.PRNGKey(1)
        for _ in range(2):
            state, key, ms = chunk(state, key, batch, lr)
        float(ms["gen_loss"][-1])
        n_chunks = 3
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            state, key, ms = chunk(state, key, batch, lr)
        float(ms["gen_loss"][-1])
        dt = (time.perf_counter() - t0) / (n_chunks * K)
        print(f"cycle batch {b} scan_steps={K}: {b / dt:.2f} img/s "
              f"({dt * 1e3:.2f} ms/step)", flush=True)
    except Exception as e:
        print(f"cycle scan failed: {type(e).__name__}: {str(e)[:200]}",
              flush=True)

    # fresh state for the trace (scan donated the previous one)
    cfg, state, step, batch = build(b)
    for i in range(4):
        state, m = step(state, batch, lr, jax.random.PRNGKey(i))
    float(m["gen_loss"])
    tdir = "/tmp/cycle_trace"
    with jax.profiler.trace(tdir):
        for i in range(3):
            state, m = step(state, batch, lr, jax.random.PRNGKey(i))
        float(m["gen_loss"])
    print(f"trace written to {tdir} (batch {b}); run: "
          f"python perf_sol.py {tdir} {b}", flush=True)


if __name__ == "__main__":
    main()
