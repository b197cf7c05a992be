#!/usr/bin/env python
"""Round-3 step attribution (VERDICT r2 item 6): profile the full sggan
train step at the bench config and attribute the residual time between
the measured throughput (~137 img/s) and the conv speed-of-light
(~162 img/s at XLA's own 110 TF/s conv rate) at fusion granularity.

Parses the perfetto trace emitted through the relay (perf_profile.py
proved the path works) and prints the top device ops grouped by kind
(convolution / fusion / copy-transpose / allreduce / other) plus the
exact top-30 list with durations, so the 15% gap is either claimed by a
landable optimization or refuted line by line.

    python perf_step_trace.py [batch]
"""

import glob
import gzip
import json
import re
import sys
import time

import jax
import jax.numpy as jnp

from sggan_tpu.config import Config
from sggan_tpu.train import init_state, make_train_step


def build(b, h=256, w=512):
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
    return cfg, state, step, batch


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cfg, state, step, batch = build(b)
    lr = jnp.float32(1e-3)
    for i in range(4):
        state, m = step(state, batch, lr, jax.random.PRNGKey(i))
    float(m["gen_loss"])

    tdir = "/tmp/step_trace"
    with jax.profiler.trace(tdir):
        for i in range(3):
            state, m = step(state, batch, lr, jax.random.PRNGKey(i))
        float(m["gen_loss"])

    # time it too (host-read fenced)
    t0 = time.perf_counter()
    for i in range(16):
        state, m = step(state, batch, lr, jax.random.PRNGKey(i))
    float(m["gen_loss"])
    dt = (time.perf_counter() - t0) / 16
    print(f"step: {dt * 1e3:.2f} ms ({b / dt:.2f} img/s)")

    # ---- parse the perfetto trace ----
    paths = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))
    assert paths, "no trace written"
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    # keep device-lane events only: XLA ops carry args with hlo info or
    # names like "fusion.123"; drop python/runtime lanes by thread name
    pid_names = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "tpu" in n or "/device" in n.lower()}
    dev = [e for e in events if e["pid"] in dev_pids] or events

    agg = {}
    for e in dev:
        name = e["name"]
        a = agg.setdefault(name, [0.0, 0])
        a[0] += e["dur"] / 1e3  # us -> ms
        a[1] += 1

    def kind(name):
        n = name.lower()
        if "conv" in n:
            return "convolution"
        if re.search(r"all-reduce|all-gather|collective", n):
            return "collective"
        if re.search(r"copy|transpose|bitcast", n):
            return "copy/transpose"
        if "reduce" in n:
            return "reduce"
        if "fusion" in n or "loop" in n:
            return "fusion(elementwise)"
        return "other"

    by_kind = {}
    for name, (ms, cnt) in agg.items():
        by_kind.setdefault(kind(name), [0.0])[0] += ms
    total = sum(v[0] for v in by_kind.values())
    print(f"\ntraced device total: {total:.1f} ms over 3 steps "
          f"({total / 3:.1f} ms/step)")
    for k, (ms,) in sorted(by_kind.items(), key=lambda kv: -kv[1][0]):
        print(f"  {k:22s} {ms / 3:8.2f} ms/step  ({ms / total * 100:5.1f}%)")

    print("\ntop 30 ops (ms per step):")
    for name, (ms, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:30]:
        print(f"  {ms / 3:8.3f} ms  x{cnt:<4d} {name[:100]}")


if __name__ == "__main__":
    main()
