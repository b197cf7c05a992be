"""Cycle-consistency trainer tests (loss_mode="cycle")."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from sggan_tpu.config import Config
from sggan_tpu.train.cycle import (build_cycle_step_fn, init_cycle_state,
                                   make_cycle_train_step)


def cfg_(**kw):
    base = dict(image_height=32, image_width=32, ngf=4, ndf=4,
                segment_class=8, batch_size=2, max_size=4,
                compute_dtype="float32", loss_mode="cycle",
                use_resnet=True, L1_lambda=10.0, Lg_lambda=5.0,
                identity_lambda=5.0)
    base.update(kw)
    return Config(**base)


def make_batch(cfg, key):
    ks = jax.random.split(key, 6)
    h, w = cfg.image_height, cfg.image_width
    hm, wm = cfg.mask_hw
    b = cfg.batch_size

    def mask(k):
        return jax.nn.one_hot(
            jax.random.randint(k, (b, hm, wm), 0, cfg.segment_class),
            cfg.segment_class)

    return {"real_a": jax.random.uniform(ks[0], (b, h, w, 3)),
            "seg_a": jax.random.uniform(ks[1], (b, h, w, 3)),
            "mask_a": mask(ks[2]),
            "real_b": jax.random.uniform(ks[3], (b, h, w, 3)),
            "seg_b": jax.random.uniform(ks[4], (b, h, w, 3)),
            "mask_b": mask(ks[5])}


def test_cycle_step_learns():
    cfg = cfg_()
    state = init_cycle_state(cfg, jax.random.PRNGKey(0))
    assert set(state.gen_params) == {"a2b", "b2a"}
    assert set(state.disc_params) == {"da", "db"}
    assert state.pool.buffer["fakes"].shape == (4, 2, 32, 32, 3)
    step = make_cycle_train_step(cfg, donate=False)
    batch = make_batch(cfg, jax.random.PRNGKey(1))
    gl = []
    for i in range(4):
        state, m = step(state, batch, jnp.float32(1e-3),
                        jax.random.PRNGKey(i))
        assert np.isfinite(float(m["gen_loss"]))
        assert np.isfinite(float(m["disc_loss"]))
        gl.append(float(m["gen_loss"]))
    assert gl[-1] < gl[0]
    assert int(state.step) == 4


def test_cycle_identity_term_off():
    cfg = cfg_(identity_lambda=0.0, Lg_lambda=0.0)
    state = init_cycle_state(cfg, jax.random.PRNGKey(0))
    step = make_cycle_train_step(cfg, donate=False)
    batch = make_batch(cfg, jax.random.PRNGKey(1))
    state, m = step(state, batch, jnp.float32(1e-3), jax.random.PRNGKey(0))
    assert np.isfinite(float(m["gen_loss"]))


def test_cycle_dp_runs():
    from sggan_tpu.parallel import make_mesh
    from sggan_tpu.parallel.dp import _state_spec
    from jax.sharding import PartitionSpec as P
    cfg = cfg_(batch_size=4, dropout_mode="keras_quirk")
    mesh = make_mesh(data=4, space=1, devices=jax.devices()[:4])
    fn = build_cycle_step_fn(cfg, axis_name="data")
    mapped = jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=(_state_spec(), P("data"), P(), P()),
        out_specs=(_state_spec(), P()), check_vma=False))
    from sggan_tpu.parallel import replicate
    state = replicate(init_cycle_state(cfg, jax.random.PRNGKey(0), n_data=4),
                      mesh)
    batch = make_batch(cfg, jax.random.PRNGKey(1))
    from sggan_tpu.parallel import shard_batch
    state, m = mapped(state, shard_batch(batch, mesh), jnp.float32(1e-3),
                      jax.random.PRNGKey(2))
    assert np.isfinite(float(m["gen_loss"]))


@pytest.fixture(scope="module")
def cycle_ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("datasets") / "cyc"
    rng = np.random.default_rng(11)
    for split, n in [("trainA", 2), ("trainB", 2), ("testA", 1)]:
        for sub in ["", "_seg", "_seg_class"]:
            os.makedirs(root / f"{split}{sub}", exist_ok=True)
        for i in range(n):
            name = f"x{i}.png"
            Image.fromarray(rng.integers(0, 255, (40, 48, 3), np.uint8)
                            ).save(root / split / name)
            Image.fromarray(rng.integers(0, 255, (40, 48, 4), np.uint8)
                            ).save(root / f"{split}_seg" / name)
            Image.fromarray(rng.integers(0, 8, (40, 48), np.uint8),
                            mode="L").save(root / f"{split}_seg_class" / name)
    return str(root)


def test_cycle_trainer_e2e(cycle_ds, tmp_path):
    from sggan_tpu.train.trainer import Trainer
    cfg = cfg_(dataset_dir=cycle_ds, epoch=1, batch_size=1, ngf=4, ndf=4,
               use_augmentation=False, save_freq=0, print_freq=100,
               checkpoint_dir=str(tmp_path / "ckpt"),
               sample_dir=str(tmp_path / "sample"),
               test_dir=str(tmp_path / "test"),
               log_dir=str(tmp_path / "logs"))
    t = Trainer(cfg)
    res = t.train()
    assert res["epoch"] == 0 and np.isfinite(res["gen_loss"])
    # eval used the a2b generator and wrote fakes
    assert os.listdir(cfg.test_dir)


def test_cycle_dp_via_make_dp_train_step():
    from sggan_tpu.parallel import make_dp_train_step, make_mesh, \
        replicate, shard_batch
    from sggan_tpu.train.cycle import init_cycle_state
    cfg = cfg_(batch_size=4, dropout_mode="keras_quirk")
    mesh = make_mesh(data=2, space=1, devices=jax.devices()[:2])
    state = replicate(init_cycle_state(cfg, jax.random.PRNGKey(0),
                                       n_data=2), mesh)
    step = make_dp_train_step(cfg, mesh, donate=False)
    batch = shard_batch(make_batch(cfg, jax.random.PRNGKey(1)), mesh)
    state, m = step(state, batch, jnp.float32(1e-3), jax.random.PRNGKey(2))
    assert np.isfinite(float(m["gen_loss"]))
    assert int(state.step) == 1


def test_cycle_gen_ema():
    """--gen_ema in cycle mode: one shadow tree covering BOTH generators,
    updated after the Adam step; after a few steps the shadow must lag
    the raw params but have moved off init."""
    cfg = cfg_(gen_ema=0.9).validate()
    state = init_cycle_state(cfg, jax.random.PRNGKey(0))
    assert state.ema is not None and set(state.ema) == {"a2b", "b2a"}
    init_l = [np.asarray(l).copy() for l in jax.tree.leaves(state.ema)]
    step = make_cycle_train_step(cfg, donate=False)
    batch = make_batch(cfg, jax.random.PRNGKey(1))
    for i in range(3):
        state, _ = step(state, batch, jnp.float32(1e-3),
                        jax.random.PRNGKey(i))
    ema_l = [np.asarray(l) for l in jax.tree.leaves(state.ema)]
    raw_l = [np.asarray(l) for l in jax.tree.leaves(state.gen_params)]
    assert any(not np.allclose(e, r) for e, r in zip(ema_l, raw_l))
    assert any(not np.allclose(e, i) for e, i in zip(ema_l, init_l))


def _train_once(cycle_ds, tmp_path, name, **kw):
    from sggan_tpu.train.trainer import Trainer
    cfg = cfg_(dataset_dir=cycle_ds, epoch=1, ngf=4, ndf=4,
               save_freq=0, print_freq=100,
               checkpoint_dir=str(tmp_path / name / "ckpt"),
               sample_dir=str(tmp_path / name / "sample"),
               test_dir=str(tmp_path / name / "test"),
               log_dir=str(tmp_path / name / "logs"), **kw)
    t = Trainer(cfg)
    return t, t.train()


def test_cycle_fused_matches_host_path(cycle_ds, tmp_path):
    """Cycle mode over the HBM-resident two-domain split (one fused
    gather+preprocess+step dispatch) must train identically to the
    host-iterator path: same shuffles (data_seed+epoch for A,
    data_seed+7919+epoch for B, matching train_iterator's seeding), same
    split(k_pre) -> (k_a, k_b) key sequence, same flag layout."""
    losses = {}
    for name, mb in (("fused", 2048), ("host", 0)):
        _, res = _train_once(cycle_ds, tmp_path, name, batch_size=1,
                             use_augmentation=True, device_dataset_mb=mb,
                             scan_steps=1)
        losses[name] = res["gen_loss"]
    np.testing.assert_allclose(losses["fused"], losses["host"], rtol=1e-4)


def test_cycle_fused_scan_matches_per_step(cycle_ds, tmp_path):
    """--scan_steps K in cycle mode (two-domain gathers inside the scan
    body) must match the per-step fused path: the carry key derives
    per-step (k_pre, k_step) and (k_a, k_b) by the same split sequence."""
    results = {}
    for name, k in (("scan", 2), ("per_step", 1)):
        t, res = _train_once(cycle_ds, tmp_path, name, batch_size=1,
                             use_augmentation=True,
                             device_dataset_mb=2048, scan_steps=k)
        results[name] = (res["gen_loss"],
                         jax.tree.map(np.asarray, t.state.gen_params))
    np.testing.assert_allclose(results["scan"][0], results["per_step"][0],
                               rtol=1e-3)
    for a, b in zip(jax.tree.leaves(results["scan"][1]),
                    jax.tree.leaves(results["per_step"][1])):
        np.testing.assert_allclose(a, b, atol=1e-2)


def test_cycle_fused_scan_on_dp_mesh(cycle_ds, tmp_path):
    """The fused scan dispatch extends to cycle mode on a data mesh: the
    two-domain batch shards over `data`, losses match the host path."""
    losses = {}
    for name, kw in (("fused_scan", dict(device_dataset_mb=2048,
                                         scan_steps=2)),
                     ("host", dict(device_dataset_mb=0, scan_steps=1))):
        _, res = _train_once(cycle_ds, tmp_path, name, batch_size=1,
                             use_augmentation=True, mesh_data=2, **kw)
        losses[name] = res["gen_loss"]
    assert np.isfinite(losses["fused_scan"])
    np.testing.assert_allclose(losses["fused_scan"], losses["host"],
                               rtol=1e-3)


def test_cycle_trainer_mesh_space(cycle_ds, tmp_path):
    """Cycle training on a (data x space) mesh end-to-end through the
    Trainer (fused dispatch over the two resident domains + spatially
    sharded cycle step + eval on the sharded state)."""
    _, res = _train_once(cycle_ds, tmp_path, "sp", batch_size=1,
                         use_augmentation=True, mesh_data=2, mesh_space=2,
                         device_dataset_mb=2048, scan_steps=2)
    assert np.isfinite(res["gen_loss"])


def test_cycle_remat_matches():
    """--remat in cycle mode (now honoured by both generators): same
    losses as the stored-activation step — rematerialization changes
    the schedule, not the math."""
    state = init_cycle_state(cfg_().validate(), jax.random.PRNGKey(0))
    batch = make_batch(cfg_(), jax.random.PRNGKey(1))
    out = {}
    for name, kw in (("plain", {}), ("remat", dict(remat=True))):
        cfg = cfg_(**kw).validate()
        step = make_cycle_train_step(cfg, donate=False)
        _, m = step(state, batch, jnp.float32(1e-3), jax.random.PRNGKey(2))
        out[name] = (float(m["gen_loss"]), float(m["disc_loss"]))
    np.testing.assert_allclose(out["remat"], out["plain"], rtol=1e-5)
