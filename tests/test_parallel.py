"""Multi-chip tests on the 8-virtual-device CPU mesh: data-parallel step
equivalence with the single-device step, and sharding layouts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sggan_tpu.config import Config
from sggan_tpu.parallel import make_dp_train_step, make_mesh, replicate, \
    shard_batch
from sggan_tpu.train import init_state, make_train_step


def tiny_cfg(**kw):
    base = dict(image_height=32, image_width=32, ngf=4, ndf=4,
                segment_class=8, batch_size=8, max_size=2,
                compute_dtype="float32", loss_mode="p2p",
                dropout_mode="keras_quirk")  # deterministic: no dropout rng
    base.update(kw)
    return Config(**base)


def make_batch(cfg, key, b):
    k1, k2, k3 = jax.random.split(key, 3)
    h, w = cfg.image_height, cfg.image_width
    hm, wm = cfg.mask_hw
    ids = jax.random.randint(k3, (b, hm, wm), 0, cfg.segment_class)
    return {"real_a": jax.random.uniform(k1, (b, h, w, 3)),
            "seg_a": jax.random.uniform(k2, (b, h, w, 3)),
            "mask_a": jax.nn.one_hot(ids, cfg.segment_class)}


def test_mesh_shapes():
    m = make_mesh()
    assert m.devices.shape == (8, 1)
    m2 = make_mesh(space=2)
    assert m2.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh(data=5, space=2)


def test_dp_matches_single_device_gradients():
    """One dp step on 4 shards == one single-device step on the global
    batch (same params, same LR; pmean of per-shard grads == global-batch
    grad because every loss term is a mean)."""
    cfg = tiny_cfg()
    mesh = make_mesh(data=4, space=1, devices=jax.devices()[:4])
    batch = make_batch(cfg, jax.random.PRNGKey(1), 8)
    lr = jnp.float32(1e-3)
    rng = jax.random.PRNGKey(2)

    s_single = init_state(cfg, jax.random.PRNGKey(0))
    step1 = make_train_step(cfg, donate=False)
    out_single, m_single = step1(s_single, batch, lr, rng)

    s_dp = replicate(init_state(cfg, jax.random.PRNGKey(0), n_data=4), mesh)
    dp_step = make_dp_train_step(cfg, mesh, donate=False)
    out_dp, m_dp = dp_step(s_dp, shard_batch(batch, mesh), lr, rng)

    # p2p losses are per-shard means; the global loss is their mean only
    # when shard losses are equal-weighted over equal shard sizes — true
    # here, so losses and grads (hence updated params) must match.
    np.testing.assert_allclose(float(m_dp["gen_loss"]),
                               float(m_single["gen_loss"]), rtol=2e-4)
    np.testing.assert_allclose(float(m_dp["disc_loss"]),
                               float(m_single["disc_loss"]), rtol=2e-4)
    # Adam divides by sqrt(v): fp reduction-order noise in near-zero grads
    # is amplified to O(lr) in the update, so compare with atol ~ lr/4.
    for a, b in zip(jax.tree_util.tree_leaves(out_dp.gen_params),
                    jax.tree_util.tree_leaves(out_single.gen_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2.5e-4)


def test_dp_sggan_mode_runs():
    cfg = tiny_cfg(loss_mode="sggan", use_resnet=True)
    mesh = make_mesh(data=8, space=1)
    s_dp = replicate(init_state(cfg, jax.random.PRNGKey(0), n_data=8), mesh)
    assert s_dp.pool.buffer["fake"].shape[0] == 2 * 8
    dp_step = make_dp_train_step(cfg, mesh, donate=False)
    batch = shard_batch(make_batch(cfg, jax.random.PRNGKey(1), 8), mesh)
    for i in range(2):
        s_dp, m = dp_step(s_dp, batch, jnp.float32(1e-3),
                          jax.random.PRNGKey(i))
    assert np.isfinite(float(m["gen_loss"]))
    assert int(s_dp.step) == 2


def test_dp_pix2pix_mode_runs():
    cfg = tiny_cfg(use_pix2pix=True)
    mesh = make_mesh(data=2, space=1, devices=jax.devices()[:2])
    s_dp = replicate(init_state(cfg, jax.random.PRNGKey(0), n_data=2), mesh)
    dp_step = make_dp_train_step(cfg, mesh, donate=False)
    batch = shard_batch(make_batch(cfg, jax.random.PRNGKey(1), 4), mesh)
    s_dp, m = dp_step(s_dp, batch, jnp.float32(1e-3), jax.random.PRNGKey(0))
    assert np.isfinite(float(m["gen_loss"]))
