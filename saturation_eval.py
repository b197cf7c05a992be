#!/usr/bin/env python
"""Saturation experiment (VERDICT r2 item 3): does the reference's
Overall-Acc 0.936 rest on saturated generator outputs?

QUALITY.md argues the reference's eval feeds 0-255-range floats into a
tanh generator (model.py:555-557), saturating nearly every output pixel
to {-1, +1}; frequency-weighted metrics (Overall Acc, FreqW Acc) then
reward collapsing to dominant classes while per-class Mean Acc craters
(its best is 0.345).  This script runs the experiment that argument was
missing: take OUR trained generator (calibrated, mid-range outputs),
HARDEN its outputs to +-1 (np.sign — the saturation limit), and
re-score under each eval convention.  If Overall/FreqW Acc jump toward
the reference's numbers while Mean Acc/IoU fall, the OA gap is proven
to be a saturation artifact that trades against per-class coverage.

    python saturation_eval.py <workdir> [key=value ...]

<workdir> must hold a checkpoint/ written by quality_run.py with the
same overrides.  Prints one JSON line per (hardening x convention).
"""

import json
import os
import sys

import numpy as np

from quality_run import VARIANTS, _parse_override
from sggan_tpu.config import Config
from sggan_tpu.train.trainer import Trainer
from sggan_tpu.utils import checkpoint as ckpt


class HardenTrainer(Trainer):
    harden = False

    def generate(self, images01):
        fake = super().generate(images01)
        if self.harden:
            # the saturation limit of the reference's uint8-input eval:
            # every tanh output pixel pinned to +-1
            fake = np.sign(fake)
        return fake


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/q_sat17"
    overrides = dict(
        (k, _parse_override(v))
        for k, v in (a.split("=", 1) for a in sys.argv[2:]))
    os.chdir(work)
    cfg = Config(dataset_dir="/root/reference/datasets/city",
                 epoch=1, batch_size=1, image_height=128, image_width=128,
                 phase="test", data_seed=19, compute_dtype="bfloat16",
                 decode_cache_mb=8192,
                 loss_mode="sggan", use_resnet=True, sggan_l1_target="seg"
                 ).replace(**overrides).validate()
    tr = HardenTrainer(cfg)
    restored = ckpt.load(tr.state, cfg.checkpoint_dir, cfg.dataset_dir)
    assert restored is not None, "no checkpoint in " + work
    tr.state = restored
    print(f" [*] restored step "
          f"{int(np.asarray(restored.step))} from {work}", flush=True)

    for harden in (False, True):
        tr.harden = harden
        for name, kw in VARIANTS:
            tr.cfg = cfg.replace(**kw)
            try:
                _, score = tr.test_during_train(0, None)
            finally:
                tr.cfg = cfg
            rec = {"harden": harden, "variant": name}
            rec.update({k: float(v) for k, v in score.items()
                        if not isinstance(v, dict)})
            print("SAT " + json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
