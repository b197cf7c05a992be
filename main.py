#!/usr/bin/env python
"""CLI entry point — parity with the reference's main.py: same flags, same
dispatch (`--phase train` -> Trainer.train(), else Trainer.test()), same
directory bootstrapping (main.py:47-60)."""

import os

from sggan_tpu.config import parse_args
from sggan_tpu.train.trainer import Trainer


def main(argv=None):
    cfg = parse_args(argv)
    for d in (cfg.checkpoint_dir, cfg.sample_dir, cfg.test_dir):
        os.makedirs(d, exist_ok=True)
    trainer = Trainer(cfg)
    if cfg.phase == "train":
        trainer.train()
    else:
        trainer.test()


if __name__ == "__main__":
    main()
