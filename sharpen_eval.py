#!/usr/bin/env python
"""OA/IoU frontier sweep (VERDICT r3 item 6): map the trade between
Overall Acc and Mean IoU under an eval-time output-sharpening knob, to
finish the saturation argument (QUALITY.md): the reference's 0.936 OA
rides saturated outputs; sharpening OUR calibrated outputs toward +-1
should raise OA monotonically toward the hardened ~0.82 point while
Mean IoU falls — proving the two metrics trade against each other on
this objective rather than 0.936 being reachable for free.

Knob: tanh temperature T — fake' = tanh(T * atanh(clip(fake))); T=1 is
the calibrated output, T=inf the np.sign hardening limit
(saturation_eval.py).  Monotone in |fake| per pixel, argmax-preserving
in the 2-class-per-pixel limit but NOT in general — which is the point:
sharpening shifts borderline channel races toward the dominant class.

    python sharpen_eval.py <workdir> [key=value ...]

The production form of this knob is the `--eval_sharpen T` Config
flag (applied on device in train/evaluate.py::sharpen and baked into
serving artifacts by `sggan_tpu.serve --export`); this script keeps
its original host-side numpy application so the QUALITY.md sweep
stays exactly reproducible (device f32 tanh/atanh differ by ulps).

<workdir> must hold a checkpoint/ written by quality_run.py with the
same overrides.  Scores under the clean convention ([0,1] inputs,
honest argmax).  Prints one JSON line per temperature.
"""

import json
import os
import sys

import numpy as np

from quality_run import _parse_override
from sggan_tpu.config import Config
from sggan_tpu.train.trainer import Trainer
from sggan_tpu.utils import checkpoint as ckpt

TEMPS = [1.0, 1.25, 1.5, 2.0, 3.0, 5.0, 8.0, 16.0, float("inf")]


class SharpenTrainer(Trainer):
    temp = 1.0

    def generate(self, images01, as_u8: bool = False):
        fake = super().generate(images01, as_u8=False)
        if self.temp != 1.0:
            if np.isinf(self.temp):
                fake = np.sign(fake)
            else:
                safe = np.clip(fake, -1 + 1e-6, 1 - 1e-6)
                fake = np.tanh(self.temp * np.arctanh(safe))
        if as_u8:
            import jax.numpy as jnp

            from sggan_tpu.data.preprocess import fake_u8
            return np.asarray(fake_u8(jnp.asarray(fake, jnp.float32)))
        return fake


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/q_frontier"
    overrides = dict(
        (k, _parse_override(v))
        for k, v in (a.split("=", 1) for a in sys.argv[2:]))
    os.chdir(work)
    if overrides.get("eval_sharpen", 1.0) != 1.0:
        # ADVICE r4: Trainer.generate already applies cfg.eval_sharpen on
        # device; this script's host-side temperature must stay the ONLY
        # application or the sweep silently sharpens twice.
        raise SystemExit("sharpen_eval.py applies its own host-side "
                         "temperature; eval_sharpen must stay 1.0")
    cfg = Config(dataset_dir="/root/reference/datasets/city",
                 epoch=1, batch_size=1, image_height=128, image_width=128,
                 phase="test", data_seed=19, compute_dtype="bfloat16",
                 decode_cache_mb=8192, loss_mode="sggan", use_resnet=True,
                 sggan_l1_target="seg", test_uint8_input=False,
                 compat_eval_overflow=False, eval_sharpen=1.0,
                 ).replace(**overrides).validate()
    tr = SharpenTrainer(cfg)
    restored = ckpt.load(tr.state, cfg.checkpoint_dir, cfg.dataset_dir)
    assert restored is not None, "no checkpoint in " + work
    tr.state = restored
    for temp in TEMPS:
        tr.temp = temp
        _, score = tr.test_during_train(0, None)
        t_str = "inf" if np.isinf(temp) else temp
        rec = {"temperature": t_str}
        rec.update({k: float(v) for k, v in score.items()
                    if not isinstance(v, dict)})
        print("SWEEP " + json.dumps(rec), flush=True)
        # per-class IoU (VERDICT r4 item 5): only classes present in the
        # eval set's ground truth or predictions (others are NaN)
        cls = {str(k): round(float(v), 4)
               for k, v in score.get("Class IoU", {}).items()
               if np.isfinite(v)}
        print("CLSIOU " + json.dumps({"temperature": t_str, "iou": cls}),
              flush=True)


if __name__ == "__main__":
    main()
