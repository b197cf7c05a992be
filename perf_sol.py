#!/usr/bin/env python
"""Speed-of-light re-derivation from a step trace (VERDICT r3 item 2).

Parses the perfetto trace perf_step_trace.py leaves in /tmp/step_trace
and derives ONE self-consistent speed-of-light for the train step:

  SOL = measured convolution time            (convs already run at the
                                              chip's demonstrated rate —
                                              144-159 TF/s in-step; we do
                                              not assume they get faster)
      + sum over every other op of
          bytes_accessed / HBM_BW            (the op's bandwidth bound —
                                              819 GB/s on v5e)

The gap (measured - SOL) is then attributed category by category, so
the PERF.md accounting SUMS to the headline difference instead of
resting on an assumed conv rate like the round-2 162 img/s figure.

    python perf_sol.py [trace_dir] [batch]
"""

import glob
import gzip
import json
import sys

HBM_BW = 819e9  # v5e HBM bytes/sec


def main():
    tdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/step_trace"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    paths = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))
    assert paths, "no trace under " + tdir
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)

    # device ops only: the rows the TPU profiler annotates with an HLO
    # category (module/jit aggregate rows carry no such args).  Each op
    # appears once per traced step.
    ops = [e for e in trace["traceEvents"]
           if e.get("ph") == "X" and "hlo_category" in e.get("args", {})]
    n_steps = 3  # perf_step_trace.py traces 3 steps
    cats = {}
    for e in ops:
        a = e["args"]
        cat = a["hlo_category"]
        dur = float(a.get("device_duration_ps", 0)) / 1e12  # s
        byt = float(a.get("bytes_accessed", 0))
        flp = float(a.get("model_flops", 0) or 0)
        c = cats.setdefault(cat, dict(ms=0.0, bytes=0.0, flops=0.0, n=0))
        c["ms"] += dur * 1e3 / n_steps
        c["bytes"] += byt / n_steps
        c["flops"] += flp / n_steps
        c["n"] += 1

    total = sum(c["ms"] for c in cats.values())
    sol = 0.0
    rows = []
    for cat, c in sorted(cats.items(), key=lambda kv: -kv[1]["ms"]):
        is_conv = "convolution" in cat
        # async DMA rows (start/done pairs) double-count their bytes
        # against ops that already account them, and DMA overlaps
        # compute in the ideal schedule — their SOL share is zero
        is_async = cat in ("async-start", "async-done", "copy-start",
                           "copy-done")
        bound_ms = (c["ms"] if is_conv
                    else 0.0 if is_async
                    else c["bytes"] / HBM_BW * 1e3)
        sol += bound_ms
        rows.append({
            "category": cat, "ms": round(c["ms"], 2),
            "tfs": round(c["flops"] / (c["ms"] / 1e3) / 1e12, 1)
            if c["ms"] else 0.0,
            "gbs": round(c["bytes"] / (c["ms"] / 1e3) / 1e9, 0)
            if c["ms"] else 0.0,
            "bound_ms": round(bound_ms, 2),
            "gap_ms": round(c["ms"] - bound_ms, 2),
        })
        print(f"  {cat:28s} {c['ms']:7.2f} ms  "
              f"{rows[-1]['tfs']:6.1f} TF/s {rows[-1]['gbs']:6.0f} GB/s"
              f"  bound {bound_ms:7.2f}  gap {c['ms'] - bound_ms:6.2f}",
              file=sys.stderr, flush=True)

    print(f"\ndevice total {total:.1f} ms/step; SOL {sol:.1f} ms/step "
          f"({batch / sol * 1e3:.1f} img/s); achieved/SOL = "
          f"{sol / total * 100:.1f}%", file=sys.stderr)
    print(json.dumps({"batch": batch,
                      "device_ms_per_step": round(total, 2),
                      "sol_ms_per_step": round(sol, 2),
                      "sol_img_per_s": round(batch / sol * 1e3, 1),
                      "achieved_over_sol": round(sol / total, 4),
                      "categories": rows}))


if __name__ == "__main__":
    main()
