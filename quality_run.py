#!/usr/bin/env python
"""Quality run (QUALITY.md): train on the reference's city fixture at its
best-run config and evaluate every epoch under THREE eval conventions:

  base     — test_uint8_input=True,  compat_eval_overflow=False (round-1)
  refquirk — test_uint8_input=True,  compat_eval_overflow=True  (exactly
             the reference's metric pipeline, metric.py:75 wrap included —
             the only numbers directly comparable to its logged 0.936
             Overall Acc / 0.324 Mean IoU)
  clean    — test_uint8_input=False, compat_eval_overflow=False ([0,1]
             inputs, honest argmax)

    python quality_run.py <seed> <epochs> [workdir] [key=value ...]

Trailing key=value pairs override Config fields (ints/floats/bools
parsed), e.g. ``loss_mode=sggan use_resnet=true image_height=256
image_width=512`` runs the flagship TPU-native configuration instead of
the reference-default p2p/unet/128px.  Prints one JSON line per epoch
per variant; scalars also land in the run's tfevents (primary variant
only).
"""

import json
import os
import sys

from sggan_tpu.config import Config
from sggan_tpu.train.trainer import Trainer

VARIANTS = [
    ("base", dict(test_uint8_input=True, compat_eval_overflow=False)),
    ("refquirk", dict(test_uint8_input=True, compat_eval_overflow=True)),
    ("clean", dict(test_uint8_input=False, compat_eval_overflow=False)),
]


class MultiEvalTrainer(Trainer):
    def test_during_train(self, epoch, writer=None):
        orig = self.cfg
        out = score0 = None
        for name, kw in VARIANTS:
            try:
                self.cfg = orig.replace(**kw)
                o, score = super().test_during_train(
                    epoch, writer if name == "base" else None)
            finally:
                self.cfg = orig
            if name == "base":
                out, score0 = o, score
            rec = {"epoch": epoch, "variant": name}
            rec.update({k: float(v) for k, v in score.items()
                        if not isinstance(v, dict)})
            print("EVAL " + json.dumps(rec), flush=True)
        return out, score0


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
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 19
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 21
    work = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/quality_s{seed}"
    overrides = dict(
        (k, _parse_override(v))
        for k, v in (a.split("=", 1) for a in sys.argv[4:]))
    os.makedirs(work, exist_ok=True)
    os.chdir(work)
    cfg = Config(dataset_dir="/root/reference/datasets/city",
                 epoch=epochs, batch_size=1, image_height=128,
                 image_width=128, phase="train", data_seed=seed,
                 compute_dtype="bfloat16", decode_cache_mb=8192,
                 save_freq=0, print_freq=50).replace(**overrides).validate()
    tr = MultiEvalTrainer(cfg)
    last = tr.train()
    print("DONE " + json.dumps({"seed": seed, "epochs": epochs,
                                "last_epoch": last.get("epoch")}),
          flush=True)


if __name__ == "__main__":
    main()
