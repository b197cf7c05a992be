"""Mocked multi-host test: a real 2-process jax.distributed CPU job
(2 virtual devices per process) exercising parallel/distributed.py —
initialize, coordinator detection, the host-spanning global mesh, a
cross-process allreduce, and one data-parallel train step."""

import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_job():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "_dist_worker.py"),
             str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "OK allreduce 48.0" in out, out
        assert "OK dp_step" in out, out


def _tiny_dataset(root, n_train=8, n_test=1):
    import numpy as np
    from PIL import Image
    rng = np.random.default_rng(5)
    for split, n in [("trainA", n_train), ("trainB", n_train),
                     ("testA", n_test)]:
        for sub in ["", "_seg", "_seg_class"]:
            os.makedirs(os.path.join(root, f"{split}{sub}"), exist_ok=True)
        for i in range(n):
            name = f"d{i}.png"
            Image.fromarray(rng.integers(0, 255, (32, 32, 3), "uint8")
                            ).save(os.path.join(root, split, name))
            Image.fromarray(rng.integers(0, 255, (32, 32, 3), "uint8")
                            ).save(os.path.join(root, f"{split}_seg", name))
            Image.fromarray(rng.integers(0, 8, (32, 32), "uint8"),
                            mode="L").save(
                os.path.join(root, f"{split}_seg_class", name))


@pytest.mark.parametrize("mode", ["dp", "spatial", "cycle"])
def test_two_process_trainer_matches_single_process(tmp_path, mode):
    """Trainer.train across 2 processes — per-process file sharding,
    make_array_from_process_local_data batch assembly, coordinator-gated
    writes — must produce the SAME losses as a single-process run over
    the identical global batch (same seed, same per-sample augmentation
    keys via the global-row machinery).  Modes: plain dp (VERDICT r2
    item 5), (data x space) spatial sharding spanning hosts, and
    two-domain cycle training over the dp mesh."""
    import numpy as np

    ds = str(tmp_path / "m")
    _tiny_dataset(ds)

    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "_dist_trainer_worker.py"),
             str(pid), str(port), ds, str(tmp_path), mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            # generous: the cycle variant compiles the two-domain step,
            # eval, AND the resume continuation in both workers — on
            # this 1-core host under a concurrent suite that can exceed
            # 540 s even though the serial run finishes well inside it
            out, _ = p.communicate(timeout=1500)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    losses = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        line = [l for l in out.splitlines() if l.startswith("OK trainer")]
        assert line, out
        losses.append(float(line[0].split()[-1]))
        assert any(l.startswith("OK resume") for l in out.splitlines()), out
    assert losses[0] == losses[1]  # replicated metrics agree across hosts

    # single-process reference: the same mesh over 4 local devices
    from tests._dist_trainer_worker import make_cfg
    from sggan_tpu.train.trainer import Trainer
    cfg = make_cfg(mode, ds, str(tmp_path), 0)
    cfg = cfg.replace(checkpoint_dir=str(tmp_path / f"ckpt_ref_{mode}"),
                      sample_dir=str(tmp_path / f"sample_ref_{mode}"),
                      test_dir=str(tmp_path / f"test_ref_{mode}"),
                      log_dir=str(tmp_path / f"logs_ref_{mode}"))
    res = Trainer(cfg).train()
    np.testing.assert_allclose(losses[0], res["gen_loss"], rtol=1e-4)
