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

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2"
                           ).strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    dataset = sys.argv[3]
    work = sys.argv[4]

    import jax
    jax.config.update("jax_platforms", "cpu")

    from sggan_tpu.config import Config
    from sggan_tpu.parallel import distributed
    from sggan_tpu.train.trainer import Trainer

    distributed.initialize(f"localhost:{port}", 2, pid)
    assert jax.device_count() == 4

    cfg = Config(dataset_dir=dataset, epoch=1, batch_size=4,
                 image_height=32, image_width=32, ngf=4, ndf=4,
                 segment_class=8, compute_dtype="float32",
                 loss_mode="sggan", use_resnet=True, max_size=2,
                 mesh_data=4, save_freq=0, print_freq=100,
                 device_dataset_mb=0,
                 checkpoint_dir=os.path.join(work, "ckpt"),  # shared fs
                 sample_dir=os.path.join(work, f"sample{pid}"),
                 test_dir=os.path.join(work, f"test{pid}"),
                 log_dir=os.path.join(work, f"logs{pid}"))
    t = Trainer(cfg)
    assert t.n_proc == 2 and t.local_bs == 2
    res = t.train()
    # primary-gated side effects: the shared checkpoint exists (written
    # once by orbax's primary host); eval/TB ran only on the coordinator
    ds_name = os.path.basename(os.path.normpath(dataset))
    assert os.path.isdir(os.path.join(work, "ckpt", ds_name, "gen"))
    wrote_eval = os.path.isdir(os.path.join(work, f"test{pid}"))
    wrote_tb = os.path.isdir(os.path.join(work, f"logs{pid}"))
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
