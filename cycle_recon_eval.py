#!/usr/bin/env python
"""Cycle reconstruction / identity metrics for a trained two-domain cycle
run (QUALITY.md round 5) — the quantitative evidence the degenerate
GTA-fixture seg-eval cannot provide (the one bundled GTA seg frame's
channel-argmax is single-class, collapsing all four seg scores to one
number; see QUALITY.md).

Loads the run's checkpoint (EMA shadow when --gen_ema was on, like every
eval/serving path), then reports the training objective's own L1 terms
(cycle.py:126-132 semantics: inputs in [0, 1], tanh outputs) measured on
held-out-able data:

  A-side (the run's testA):  cyc_a = |G_ba(G_ab(a)) - a|,
                             idt_a = |G_ba(a) - a|
  B-side (--b_dir eval set): cyc_b = |G_ab(G_ba(b)) - b|,
                             idt_b = |G_ab(b) - b|

and writes a sample strip (a, G_ab(a), recon a) + (b, G_ba(b), recon b)
PNGs under <run>/recon/ for visual inspection.

    python cycle_recon_eval.py <run_dir> [b_dir] [key=value ...]
"""

import json
import os
import sys

import numpy as np


def _parse_override(v: str):
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    return v


def main():
    run = sys.argv[1]
    b_dir = sys.argv[2] if len(sys.argv) > 2 and "=" not in sys.argv[2] \
        else "/tmp/ds_city80/city/testA"
    overrides = dict((k, _parse_override(v)) for k, v in
                     (a.split("=", 1) for a in sys.argv[2:] if "=" in a))
    os.chdir(run)

    import jax.numpy as jnp
    from PIL import Image

    from sggan_tpu.config import Config
    from sggan_tpu.data.preprocess import preprocess_test
    from sggan_tpu.models import generator_resnet, generator_unet
    from sggan_tpu.train.trainer import Trainer
    from sggan_tpu.utils import checkpoint as ckpt

    cfg = Config(loss_mode="cycle", batch_size=1, image_height=128,
                 image_width=128, compute_dtype="bfloat16",
                 decode_cache_mb=8192).replace(**overrides).validate()
    tr = Trainer(cfg)
    restored = ckpt.load(tr.state, cfg.checkpoint_dir, cfg.dataset_dir)
    assert restored is not None, "no checkpoint under %s" % cfg.checkpoint_dir
    tr.state = restored
    gp = tr.state.ema if tr.state.ema is not None else tr.state.gen_params

    gen = generator_resnet if cfg.use_resnet else generator_unet
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def g(which, x):
        kw = {}
        if cfg.use_resnet:  # mirror evaluate.gen_forward's head selection
            kw["pad_free_head"] = cfg.pad_free_head \
                if cfg.pad_free_head is not None else not cfg.remat
        return gen.apply(gp[which], x, compute_dtype=cd,
                         **kw).astype(jnp.float32)

    def load_dir(d):
        ims = []
        for f in sorted(os.listdir(d)):
            a = np.asarray(Image.open(os.path.join(d, f)))[..., :3]
            ims.append(a.astype(np.uint8))
        x = np.stack(ims)
        out, _, _, _ = preprocess_test(
            x, x, np.zeros(x.shape[:3], np.uint8),
            out_hw=(cfg.image_height, cfg.image_width),
            mask_hw=cfg.mask_hw, n_class=cfg.segment_class,
            with_masks=False)
        return out  # (N, H, W, 3) float32 in [0, 1]

    root = cfg.dataset_dir if os.path.isabs(cfg.dataset_dir) \
        else os.path.abspath(cfg.dataset_dir)
    a = load_dir(os.path.join(root, "testA"))
    b = load_dir(b_dir)

    l1 = lambda x, y: float(jnp.mean(jnp.abs(x - y)))
    fake_b = g("a2b", a)
    cyc_a = g("b2a", fake_b)
    idt_a = g("b2a", a)
    fake_a = g("b2a", b)
    cyc_b = g("a2b", fake_a)
    idt_b = g("a2b", b)

    rec = {
        "n_a": int(a.shape[0]), "n_b": int(b.shape[0]),
        "cyc_a_l1": l1(cyc_a, a), "idt_a_l1": l1(idt_a, a),
        "cyc_b_l1": l1(cyc_b, b), "idt_b_l1": l1(idt_b, b),
    }
    print("RECON " + json.dumps({k: round(v, 4) if isinstance(v, float)
                                 else v for k, v in rec.items()}),
          flush=True)

    os.makedirs("recon", exist_ok=True)

    def dump(name, *imgs01_or_pm1):
        row = []
        for im in imgs01_or_pm1:
            v = np.asarray(im)
            if v.min() < -0.01:           # tanh-range output
                v = (v + 1.0) / 2.0
            row.append(np.clip(v, 0, 1))
        strip = (np.concatenate(row, axis=1) * 255).astype(np.uint8)
        Image.fromarray(strip).save(os.path.join("recon", name))

    dump("a_fake_recon.png", a[0], fake_b[0], cyc_a[0])
    dump("b_fake_recon.png", b[0], fake_a[0], cyc_b[0])
    print("samples: recon/a_fake_recon.png recon/b_fake_recon.png")


if __name__ == "__main__":
    main()
