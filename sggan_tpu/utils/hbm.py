"""Compile-only HBM sizing probe.

Large-resolution train programs can exceed device memory, and through a
remote-compile service each failed attempt costs minutes (plus, for a
training run, the whole relaunch).  This tool compiles the EXACT program
a config would run — the fused gather+preprocess+step, its
``--scan_steps`` lax.scan chunk, or the eval generator forward — from
abstract ``ShapeDtypeStruct`` inputs: no dataset is uploaded and nothing
executes, so a probe is safe and costs only the compile.

THE FIT VERDICT IS COMPILE SUCCESS.  TPU memory assignment is static:
a program that exceeds HBM fails AT COMPILE TIME with "Ran out of
memory in memory space hbm" (that error carries the exact used/limit
bytes, which this probe parses into the result).  A probe that
compiles therefore FITS.  XLA's ``memory_analysis`` byte split is
reported as supplementary accounting only — measured on this chip it
OVERCOUNTS the true peak (temp + argument totals can exceed physical
HBM on a program that compiles and runs, because donated argument
buffers are reused for temporaries but still counted in both pools).

The verdict is BACKEND-SPECIFIC: probe on the device you will train on
(a CPU probe checks shapes/plumbing but says nothing about TPU HBM).

CLI (same flags as main.py, plus probe controls):

    python -m sggan_tpu.utils.hbm --img_height 1024 --img_width 2048 \
        --loss_mode sggan --use_resnet --scan_steps 8 \
        --probe_items 100 --probe_src 1024x2048

prints one JSON line: ``fits`` (the compile verdict), byte counts, and
on an HBM-overflow failure the parsed used/limit bytes.

No reference counterpart (the reference is eager and single-resolution);
SURVEY §5 observability scope.
"""

from __future__ import annotations

import json
import re
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _sds(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


def _parse_oom(msg: str) -> dict:
    """Pull used/limit bytes out of a TPU compile-time OOM message
    ('... Ran out of memory in memory space hbm. Used 15.75G of
    15.75G ...')."""
    m = re.search(r"[Uu]sed ([\d.]+)([GMK])i?B?.{0,8}?of "
                  r"([\d.]+)([GMK])", msg)
    if not m:
        return {}
    mul = {"K": 2 ** 10, "M": 2 ** 20, "G": 2 ** 30}
    return {"oom_used_bytes": int(float(m.group(1)) * mul[m.group(2)]),
            "oom_limit_bytes": int(float(m.group(3)) * mul[m.group(4)])}


def probe_memory(cfg, source_hw: Optional[Tuple[int, int]] = None,
                 n_items: int = 100, kind: str = "auto") -> dict:
    """Abstractly compile the configured program and return its memory
    analysis.

    kind: "scan" (the --scan_steps fused program), "step" (the
    single-step fused program), "eval" (the generator eval forward), or
    "auto" (scan when cfg.scan_steps > 1 else step).
    source_hw: decoded source (H, W) as the loader would feed it (after
    --host_downscale); defaults to the training resolution.
    n_items: device-resident split length (affects the resident-split
    argument bytes only).
    """
    from ..train.trainer import Trainer

    if kind == "auto":
        kind = "scan" if cfg.scan_steps > 1 else "step"
    sh, sw = source_hw or (cfg.image_height, cfg.image_width)
    # Build the Trainer (whose jit wrappers we lower) with its state
    # allocated on HOST CPU: state init would otherwise run as real
    # device programs on the probed backend — several remote compiles
    # and a full state allocation before the one compile we want.  The
    # lowered programs still target the default backend (we pass only
    # ShapeDtypeStructs).  Mesh configs still place state on the mesh.
    if cfg.mesh_data <= 1 and cfg.mesh_space <= 1:
        with jax.default_device(jax.devices("cpu")[0]):
            tr = Trainer(cfg)
    else:
        tr = Trainer(cfg)
    state_sds = jax.tree.map(lambda x: _sds(x.shape, x.dtype), tr.state)
    img = _sds((n_items, sh, sw, 3), jnp.uint8)
    cls = _sds((n_items, sh, sw), jnp.uint8)
    lr = _sds((), jnp.float32)
    key = _sds((2,), jnp.uint32)

    if kind == "eval":
        gp = state_sds.ema if tr.state.ema is not None \
            else state_sds.gen_params
        x = _sds((min(8, n_items), cfg.image_height, cfg.image_width, 3),
                 jnp.float32)
        lowered = tr._gen_jit.lower(gp, state_sds.gen_bn, x)
    elif kind == "scan":
        k = cfg.scan_steps
        fn = tr._make_fused_scan(None, k)
        idx = _sds((k, cfg.batch_size), jnp.int32)
        # cycle: two resident domains, (ix_a, ix_b) index tuple
        arrays = (img, img, cls) * (2 if tr.cycle else 1)
        ix = (idx, idx) if tr.cycle else idx
        lowered = fn.lower(state_sds, key, *arrays, ix, lr)
    elif kind == "step":
        fn = tr._make_fused_step(None)
        idx = _sds((cfg.batch_size,), jnp.int32)
        arrays = (img, img, cls) * (2 if tr.cycle else 1)
        ix = (idx, idx) if tr.cycle else idx
        lowered = fn.lower(state_sds, *arrays, ix, key, key, lr)
    else:
        raise ValueError(f"kind={kind!r} — scan/step/eval/auto")

    out = {"kind": kind, "backend": jax.default_backend(),
           "source_hw": [sh, sw], "n_items": n_items}
    try:
        compiled = lowered.compile()
    except Exception as e:  # TPU HBM overflow surfaces at compile time
        msg = str(e)
        if "out of memory" not in msg.lower():
            raise
        out["fits"] = False
        out.update(_parse_oom(msg))
        out["error"] = msg[:400]
        return out
    # Compile success IS the fit verdict on TPU (static memory
    # assignment; see module docstring).  On CPU it says nothing.
    if jax.default_backend() != "cpu":
        out["fits"] = True
    ma = compiled.memory_analysis()
    for f in ("temp_size_in_bytes", "argument_size_in_bytes",
              "output_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        v = getattr(ma, f, None)
        if v is not None:
            out[f.replace("_size_in_bytes", "_bytes")] = int(v)
    # Supplementary accounting only — overcounts donated-arg reuse (see
    # module docstring); the sum can exceed physical HBM on a fitting
    # program.
    known = [out.get(k2, 0) for k2 in
             ("temp_bytes", "argument_bytes", "output_bytes")]
    out["total_bytes"] = sum(known) - out.get("alias_bytes", 0)
    return out


def main(argv=None):
    from ..config import config_from_namespace, build_parser

    p = build_parser()
    p.add_argument("--probe_kind", default="auto",
                   choices=["auto", "scan", "step", "eval"])
    p.add_argument("--probe_items", type=int, default=100,
                   help="device-resident split length")
    p.add_argument("--probe_src", default=None,
                   help="decoded source HxW, e.g. 1024x2048 "
                        "(default: the training resolution)")
    ns = p.parse_args(argv)
    cfg = config_from_namespace(ns).validate()
    src = None
    if ns.probe_src:
        h, w = ns.probe_src.lower().split("x")
        src = (int(h), int(w))
    out = probe_memory(cfg, source_hw=src, n_items=ns.probe_items,
                       kind=ns.probe_kind)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
