"""Checkpointing via orbax, preserving the reference's public layout
``checkpoint/<dataset>/{gen,disc}/cp-NNNN`` (model.py:450-503) while fixing
its gaps: the reference saves *weights only* at loop exit, losing optimizer
state and the epoch counter (model.py:464-467 — its Checkpoint/
CheckpointManager pair that would capture them is built but never saved,
model.py:86-89).  Here one composite checkpoint per epoch carries
generator + discriminator params, BN state, both Adam states, the pool and
the step, with max_to_keep=3 retention (matching the dormant manager's
setting) and periodic saves driven by --save_freq (wired for real; the
reference never consults it, SURVEY §5).
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Optional

import orbax.checkpoint as ocp

from ..train.step import TrainState

_CP_RE = re.compile(r"cp-(\d+)$")
MAX_TO_KEEP = 3  # parity with the dormant CheckpointManager (model.py:88-89)


def _ckpt_root(checkpoint_dir: str, dataset_dir: str) -> str:
    # dataset_dir may be an absolute path (the CLI accepts both "city" and
    # "/data/city"); os.path.join would discard checkpoint_dir for absolute
    # paths and write checkpoints INTO the dataset — use the dataset NAME,
    # matching the reference's checkpoint/<dataset>/ layout (model.py:455).
    name = os.path.basename(os.path.normpath(dataset_dir))
    return os.path.abspath(os.path.join(checkpoint_dir, name))


def _steps(path: str):
    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        m = _CP_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def save(state: TrainState, checkpoint_dir: str, dataset_dir: str,
         epoch: int):
    """Save generator and discriminator trees under
    <checkpoint_dir>/<dataset>/{gen,disc}/cp-NNNN (reference layout,
    model.py:455-467) plus trainer state under train/cp-NNNN."""
    import jax
    multi = jax.process_count() > 1
    primary = jax.process_index() == 0
    if multi:
        from jax.experimental import multihost_utils
    root = _ckpt_root(checkpoint_dir, dataset_dir)
    ckptr = ocp.StandardCheckpointer()
    parts = {
        "gen": {"params": state.gen_params, "bn": state.gen_bn,
                "opt": state.g_opt},
        "disc": {"params": state.disc_params, "bn": state.disc_bn,
                 "opt": state.d_opt},
        "train": {"pool_buffer": state.pool.buffer,
                  "pool_count": state.pool.count, "step": state.step},
    }
    if state.ema is not None:
        parts["gen"]["ema"] = state.ema
    for name, tree in parts.items():
        d = os.path.join(root, name)
        path = os.path.join(d, f"cp-{epoch:04d}")
        # directory surgery is primary-only (a shared filesystem would
        # race); ALL processes then enter orbax's save — its internal
        # barriers require every process to participate, and it gates
        # the actual file writes to the primary host
        if primary:
            os.makedirs(d, exist_ok=True)
            if os.path.exists(path):
                shutil.rmtree(path)
        if multi:
            multihost_utils.sync_global_devices(
                f"ckpt_pre_{name}_{epoch}")
        ckptr.save(path, tree)
        if primary:
            # prune by epoch threshold — the async save above may not be
            # listed yet, so counting directory entries under-prunes
            for old in _steps(d):
                if old <= epoch - MAX_TO_KEEP:
                    shutil.rmtree(os.path.join(d, f"cp-{old:04d}"),
                                  ignore_errors=True)
    ckptr.wait_until_finished()


def latest_epoch(checkpoint_dir: str, dataset_dir: str) -> Optional[int]:
    steps = _steps(os.path.join(_ckpt_root(checkpoint_dir, dataset_dir),
                                "gen"))
    return steps[-1] if steps else None


def load(template: TrainState, checkpoint_dir: str, dataset_dir: str,
         epoch: Optional[int] = None) -> Optional[TrainState]:
    """Restore the latest (or given-epoch) checkpoint into the template's
    tree structure.  Returns None when nothing is found (reference
    load() -> False, model.py:498-503)."""
    root = _ckpt_root(checkpoint_dir, dataset_dir)
    if epoch is None:
        epoch = latest_epoch(checkpoint_dir, dataset_dir)
    if epoch is None:
        return None
    ckptr = ocp.StandardCheckpointer()

    def restore(name, tree):
        return ckptr.restore(os.path.join(root, name, f"cp-{epoch:04d}"),
                             tree)

    gen_tmpl = {"params": template.gen_params, "bn": template.gen_bn,
                "opt": template.g_opt}
    if template.ema is not None:
        gen_tmpl["ema"] = template.ema
    gen = restore("gen", gen_tmpl)
    disc = restore("disc", {"params": template.disc_params,
                            "bn": template.disc_bn, "opt": template.d_opt})
    tr = restore("train", {"pool_buffer": template.pool.buffer,
                           "pool_count": template.pool.count,
                           "step": template.step})
    pool = template.pool._replace(buffer=tr["pool_buffer"],
                                  count=tr["pool_count"])
    return TrainState(gen["params"], gen["bn"], disc["params"], disc["bn"],
                      gen["opt"], disc["opt"], pool, tr["step"],
                      gen.get("ema"))
