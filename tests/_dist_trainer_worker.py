"""Worker process for the multi-host Trainer test (test_distributed.py).

Runs as `python _dist_trainer_worker.py <pid> <port> <dataset> <workdir>`:
joins a 2-process CPU jax.distributed job (2 virtual devices per
process) and drives Trainer.train end-to-end — per-process file
sharding in the loader, global-batch assembly via
make_array_from_process_local_data, the shard_mapped dp step over the
host-spanning mesh, coordinator-gated eval/TB/checkpoint writes.
Prints the epoch-mean losses the parent compares against a
single-process run of the identical config.
"""

import os
import sys

if __name__ == "__main__":
    # worker-process env (before jax import); guarded so the parent test
    # can import make_cfg without mutating its own environment
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_cfg(mode, dataset, work, pid):
    """Worker config per mode; mirrored by the single-process reference
    run in test_distributed.py (mesh sizes identical, local devices)."""
    from sggan_tpu.config import Config
    common = dict(dataset_dir=dataset, epoch=1,
                  image_height=32, image_width=32, ngf=4, ndf=4,
                  segment_class=8, compute_dtype="float32",
                  use_resnet=True, save_freq=0, print_freq=100,
                  device_dataset_mb=0,
                  checkpoint_dir=os.path.join(work, f"ckpt_{mode}"),
                  sample_dir=os.path.join(work, f"sample_{mode}{pid}"),
                  test_dir=os.path.join(work, f"test_{mode}{pid}"),
                  log_dir=os.path.join(work, f"logs_{mode}{pid}"))
    if mode == "dp":
        return Config(batch_size=4, loss_mode="sggan", max_size=2,
                      mesh_data=4, **common)
    if mode == "spatial":
        # 2 hosts x 2 devices, (data=2, space=2): each host owns one
        # whole data row; H splits locally at device_put
        return Config(batch_size=2, loss_mode="sggan", max_size=2,
                      mesh_data=2, mesh_space=2, **common)
    assert mode == "cycle"
    return Config(batch_size=4, loss_mode="cycle", max_size=2,
                  mesh_data=4, L1_lambda=10.0, identity_lambda=5.0,
                  **common)


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    dataset = sys.argv[3]
    work = sys.argv[4]
    mode = sys.argv[5] if len(sys.argv) > 5 else "dp"

    import jax
    jax.config.update("jax_platforms", "cpu")

    from sggan_tpu.parallel import distributed
    from sggan_tpu.train.trainer import Trainer

    distributed.initialize(f"localhost:{port}", 2, pid)
    assert jax.device_count() == 4

    cfg = make_cfg(mode, dataset, work, pid)
    t = Trainer(cfg)
    assert t.n_proc == 2 and t.local_bs == cfg.batch_size // 2
    res = t.train()
    # primary-gated side effects: the shared checkpoint exists (written
    # once by orbax's primary host); eval/TB ran only on the coordinator
    ds_name = os.path.basename(os.path.normpath(dataset))
    assert os.path.isdir(os.path.join(work, f"ckpt_{mode}", ds_name, "gen"))
    wrote_eval = os.path.isdir(os.path.join(work, f"test_{mode}{pid}"))
    wrote_tb = os.path.isdir(os.path.join(work, f"logs_{mode}{pid}"))
    assert wrote_eval == (pid == 0), (pid, wrote_eval)
    assert wrote_tb == (pid == 0), (pid, wrote_tb)
    print(f"OK trainer gen_loss {res['gen_loss']:.6f}", flush=True)
    if res["score"] is not None:
        print(f"OK eval iou {res['score']['Mean IoU']:.6f}", flush=True)

    # multi-host resume: restore via a host template, re-place on the
    # global mesh, continue for another epoch
    import numpy as np
    steps_before = int(np.asarray(t.state.step))
    t2 = Trainer(cfg.replace(continue_train=True))
    res2 = t2.train()
    steps_after = int(np.asarray(t2.state.step))
    assert steps_after == 2 * steps_before, (steps_before, steps_after)
    print(f"OK resume steps {steps_before}->{steps_after} "
          f"gen_loss {res2['gen_loss']:.6f}", flush=True)


if __name__ == "__main__":
    main()
