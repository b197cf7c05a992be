#!/usr/bin/env python
"""End-to-end sustained training throughput (VERDICT r4 item 2): the
number a user actually gets at the bench config — whole-epoch img/s with
the input pipeline INCLUDED, not the step-only headline.

Setup: a real on-disk dataset of 512x1024 PNG triplets (the BASELINE
config #4 source resolution), trained at 256x512 bf16 with the flagship
sggan objective through the REAL Trainer (so the measured path is
exactly `python main.py --phase train`).  Reports, per variant:

  epoch_img_per_s      Trainer's own StepTimer per epoch (gather +
                       preprocess + step; scan chunks included) — the
                       sustained training rate; epoch 0 additionally
                       absorbs program compiles
  sustained_img_per_s  mean over epochs >= 1 (decode-free, compiled)
  wall_img_per_s       whole-run wall clock including the one-off
                       DeviceDataset decode+upload, compiles and
                       epoch-end eval — the pessimal bound

Variants:
  fused    device-resident split + single-dispatch scan_steps=8 programs
           (batch 24, augmentation off = the bench.py step shape)
  fused-aug the default user config (batch 12 + augmentation doubling =
           effective 24/step; augment warp runs inside the program)
  host     serial host path (device_dataset_mb=0): per-step decode(cache)
           + upload + preprocess + step dispatches — the reference's
           architecture (its hot loop model.py:227-258 / utils.py:167-233
           is exactly this serialized shape)

    python perf_epoch_e2e.py [n_imgs] [epochs] [variants...]
"""

import json
import os
import shutil
import sys
import time

import numpy as np

N_TEST = 2
H_SRC, W_SRC = 512, 1024


def build_dataset(root: str, n: int) -> float:
    """Synthetic but realistic-shape 512x1024 PNG triplets: smooth
    gradients + per-image structure (fast to encode, nontrivial to
    compress — the decode cost is what matters here)."""
    from PIL import Image
    if os.path.isdir(root):
        shutil.rmtree(root)
    t0 = time.perf_counter()
    yy, xx = np.mgrid[0:H_SRC, 0:W_SRC].astype(np.float32)
    rng = np.random.default_rng(0)
    for split, count in (("trainA", n), ("testA", N_TEST)):
        for sub in ("", "_seg", "_seg_class"):
            os.makedirs(os.path.join(root, split + sub))
        for i in range(count):
            ph = rng.uniform(0, 2 * np.pi, 3).astype(np.float32)
            fr = rng.uniform(1, 4, 3).astype(np.float32)
            img = np.stack([
                127.5 * (1 + np.sin(fr[c] * (xx / W_SRC * 6.28 + ph[c])
                                    + yy / H_SRC * fr[(c + 1) % 3]))
                for c in range(3)], -1).astype(np.uint8)
            cls = ((yy // 64 + xx // 64 + i) % 34).astype(np.uint8)
            seg = np.stack([cls * 7, 255 - cls * 7, cls * 3], -1) \
                .astype(np.uint8)
            nm = f"s{i:04d}.png"
            Image.fromarray(img).save(os.path.join(root, split, nm))
            Image.fromarray(seg).save(os.path.join(root, split + "_seg",
                                                   nm))
            Image.fromarray(cls, mode="L").save(
                os.path.join(root, split + "_seg_class", nm))
    return time.perf_counter() - t0


def run_variant(name: str, ds_root: str, work: str, epochs: int):
    from sggan_tpu.config import Config
    from sggan_tpu.train.trainer import Trainer
    from sggan_tpu.utils.summary import read_scalars

    wd = os.path.join(work, name)
    if os.path.isdir(wd):
        shutil.rmtree(wd)
    os.makedirs(wd)
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        common = dict(dataset_dir=ds_root, epoch=epochs,
                      image_height=256, image_width=512,
                      loss_mode="sggan", use_resnet=True,
                      segment_class=34, compute_dtype="bfloat16",
                      max_size=50, data_seed=19, save_freq=0,
                      print_freq=1000, eval_freq=1000,
                      decode_cache_mb=8192)
        if name == "fused":
            cfg = Config(batch_size=24, use_augmentation=False,
                         scan_steps=8, **common)
        elif name == "fused-aug":
            cfg = Config(batch_size=12, use_augmentation=True,
                         scan_steps=8, **common)
        elif name == "fused-ds1":
            # --host_downscale 1: the split resides in HBM AT target
            # resolution (the reference's own geometry — it host-downscales
            # before augmenting, utils.py:172-196), so the per-step
            # 512x1024 -> 256x512 antialiased resize disappears from the
            # program (preprocess._resize same-size skip)
            cfg = Config(batch_size=24, use_augmentation=False,
                         scan_steps=8, host_downscale=1, **common)
        elif name == "fused-aug-ds1":
            cfg = Config(batch_size=12, use_augmentation=True,
                         scan_steps=8, host_downscale=1, **common)
        else:
            assert name == "host"
            cfg = Config(batch_size=24, use_augmentation=False,
                         device_dataset_mb=0, prefetch=2, **common)
        cfg = cfg.validate()

        t_init0 = time.perf_counter()
        tr = Trainer(cfg)
        t_wall0 = time.perf_counter()
        tr.train()
        wall = time.perf_counter() - t_wall0
        init_s = t_wall0 - t_init0

        # per-epoch sustained rate from the trainer's own TB scalar
        logdir = os.path.join(wd, "logs")
        run = sorted(os.listdir(logdir))[-1]
        tdir = os.path.join(logdir, run, "train")
        ev = [f for f in sorted(os.listdir(tdir))
              if f.startswith("events.out")][-1]
        rates = [v for _, v in
                 read_scalars(os.path.join(tdir, ev))["Images/sec"]]
        b_eff = cfg.batch_size * (2 if cfg.use_augmentation else 1)
        n_files = len([f for f in os.listdir(
            os.path.join(ds_root, "trainA"))])
        imgs_per_epoch = (n_files // cfg.batch_size) * b_eff
        rec = {
            "variant": name, "epochs": epochs,
            "imgs_per_epoch": imgs_per_epoch,
            "epoch_img_per_s": [round(r, 2) for r in rates],
            "sustained_img_per_s": round(np.mean(rates[1:]), 2)
            if len(rates) > 1 else round(rates[0], 2),
            "wall_s": round(wall, 2),
            "wall_img_per_s": round(imgs_per_epoch * epochs / wall, 2),
            "trainer_init_s": round(init_s, 2),
        }
        print("E2E " + json.dumps(rec), flush=True)
        return rec
    finally:
        os.chdir(cwd)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    variants = sys.argv[3:] or ["fused", "fused-aug", "host"]
    ds_root = "/tmp/e2e_ds/city"
    work = "/tmp/e2e_runs"
    build_s = build_dataset(ds_root, n)
    print(f"dataset: {n} triplets at {H_SRC}x{W_SRC} built in "
          f"{build_s:.1f}s", flush=True)
    for v in variants:
        run_variant(v, ds_root, work, epochs)


if __name__ == "__main__":
    main()
