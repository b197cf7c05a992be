#!/usr/bin/env python
"""Relative data-parallel scaling on a virtual CPU mesh (VERDICT r3
item 3b): step time vs n_devices at FIXED per-device batch.  The host
has ONE core, so the n virtual devices' compute serializes onto it —
ideal scaling is step time growing ~linearly with n_devices and
per-SAMPLE time staying flat.  Any super-linear growth is
collective/plumbing overhead from the gradient allreduce spanning more
shards — the quantity this table isolates.

Each mesh size runs in a subprocess (XLA fixes the device count at
backend init), single-threaded eigen so device thread pools don't
thrash the core, and reports the MEDIAN step time over `steps` steps
(robust to GC/scheduler stragglers on the shared core).  PERF.md
carries it next to the on-chip dp(1)-vs-plain measurement
(perf_dp_overhead.py); together they back the "12 chips of dp
scale-out reaches 1500 img/s" claim: zero plumbing overhead per chip +
flat per-sample collective cost over the mesh.

Usage: python perf_dp_scaling.py [per_device_batch] [steps]
"""

import json
import os
import subprocess
import sys

_CHILD = """
import json, statistics, sys, time
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from sggan_tpu.config import Config
from sggan_tpu.parallel import dp, mesh as meshlib
from sggan_tpu.train import init_state

n_dev = int(sys.argv[1]); b_per = int(sys.argv[2]); steps = int(sys.argv[3])
assert jax.device_count() == n_dev, (jax.device_count(), n_dev)
b = b_per * n_dev
h, w = 64, 64
cfg = Config(image_height=h, image_width=w, batch_size=b, ngf=8, ndf=8,
             loss_mode="sggan", use_resnet=True, segment_class=34,
             compute_dtype="float32", max_size=50, donate=True)
key = jax.random.PRNGKey(0)
hm, wm = cfg.mask_hw
batch = {
    "real_a": jax.random.uniform(key, (b, h, w, 3)),
    "seg_a": jax.random.uniform(key, (b, h, w, 3)),
    "mask_a": jax.nn.one_hot(jax.random.randint(key, (b, hm, wm), 0, 34), 34),
}
lr = jnp.float32(1e-3)
m = meshlib.make_mesh(data=n_dev)
state = dp.replicate(init_state(cfg, key, n_data=n_dev), m)
batch = dp.shard_batch(batch, m)
step = dp.make_dp_train_step(cfg, m)
for i in range(3):
    state, mt = step(state, batch, lr, jax.random.PRNGKey(i))
float(mt["gen_loss"])
times = []
for i in range(steps):
    t0 = time.perf_counter()
    state, mt = step(state, batch, lr, jax.random.PRNGKey(i))
    float(mt["gen_loss"])
    times.append(time.perf_counter() - t0)
dt = statistics.median(times)
print(json.dumps({"n_devices": n_dev, "global_batch": b,
                  "ms_per_step": round(dt * 1e3, 2),
                  "ms_per_sample": round(dt * 1e3 / b, 3)}))
"""


def main():
    b_per = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    rows = []
    for n_dev in (1, 2, 4, 8):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["OMP_NUM_THREADS"] = "1"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            " --xla_cpu_multi_thread_eigen=false"
                            f" --xla_force_host_platform_device_count={n_dev}")
        out = subprocess.run(
            [sys.executable, "-c", _CHILD, str(n_dev), str(b_per),
             str(steps)],
            env=env, capture_output=True, text=True, cwd=os.path.dirname(
                os.path.abspath(__file__)))
        if out.returncode:
            print(out.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"n_devices={n_dev} failed")
        row = json.loads(out.stdout.strip().splitlines()[-1])
        rows.append(row)
        print(f"n={row['n_devices']}: {row['ms_per_step']:8.2f} ms/step "
              f"({row['ms_per_sample']:.3f} ms/sample)",
              file=sys.stderr, flush=True)
    base = rows[0]["ms_per_sample"]
    for r in rows:
        r["per_sample_vs_1dev"] = round(r["ms_per_sample"] / base, 3)
    print(json.dumps({"per_device_batch": b_per, "steps": steps,
                      "rows": rows}))


if __name__ == "__main__":
    main()
