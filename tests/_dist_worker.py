"""Worker process for the mocked multi-host test (test_distributed.py).

Runs as `python _dist_worker.py <process_id> <coordinator_port>`: joins a
2-process CPU jax.distributed job (2 virtual devices per process), builds
the global (data x space) mesh with `data` spanning hosts, and runs a
cross-process computation plus one data-parallel train step.  Prints
OK-lines the parent asserts on.
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

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sggan_tpu.parallel import distributed

    distributed.initialize(f"localhost:{port}", 2, pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert distributed.is_coordinator() == (pid == 0)

    mesh = distributed.global_mesh(space=1)  # data axis spans hosts
    sh = NamedSharding(mesh, P("data"))

    # cross-process allreduce: every process contributes its index + 1
    arr = jax.make_array_from_callback(
        (4, 8), sh,
        lambda idx: np.full((1, 8), jax.process_index() + 1.0, np.float32))
    total = jax.jit(jnp.sum,
                    out_shardings=NamedSharding(mesh, P()))(arr)
    got = float(total)
    assert got == (1.0 + 1.0 + 2.0 + 2.0) * 8, got
    print(f"OK allreduce {got}", flush=True)

    # one data-parallel train step over the host-spanning mesh
    from sggan_tpu.config import Config
    from sggan_tpu.parallel import make_dp_train_step, replicate
    from sggan_tpu.train import init_state

    cfg = Config(image_height=16, image_width=16, ngf=2, ndf=2,
                 segment_class=4, batch_size=4, max_size=0,
                 loss_mode="p2p", use_resnet=True,
                 compute_dtype="float32", donate=False)
    state = replicate(init_state(cfg, jax.random.PRNGKey(0), n_data=4),
                      mesh)
    step = make_dp_train_step(cfg, mesh, donate=False)
    hm, wm = cfg.mask_hw

    def mk(shape, seed):
        return jax.make_array_from_callback(
            shape, NamedSharding(mesh, P("data")),
            lambda idx: np.random.default_rng(seed).random(
                (1,) + shape[1:], np.float32))

    batch = {"real_a": mk((4, 16, 16, 3), 1), "seg_a": mk((4, 16, 16, 3), 2),
             "mask_a": mk((4, hm, wm, 4), 3)}
    state, m = step(state, batch, jnp.float32(1e-3), jax.random.PRNGKey(1))
    g = float(m["gen_loss"])
    assert np.isfinite(g), g
    print(f"OK dp_step {g:.4f}", flush=True)


if __name__ == "__main__":
    main()
