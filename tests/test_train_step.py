"""Train-step tests: the jitted step runs, losses fall, pool semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sggan_tpu.config import Config
from sggan_tpu.train import (init_state, lr_schedule, make_train_step,
                             pool_init, pool_update)


def tiny_cfg(**kw):
    base = dict(image_height=64, image_width=64, ngf=4, ndf=4,
                segment_class=8, batch_size=2, max_size=4,
                compute_dtype="float32")
    base.update(kw)
    return Config(**base)


def make_batch(cfg, key):
    k1, k2, k3 = jax.random.split(key, 3)
    h, w = cfg.image_height, cfg.image_width
    hm, wm = cfg.mask_hw
    mask_ids = jax.random.randint(k3, (cfg.batch_size, hm, wm), 0,
                                  cfg.segment_class)
    return {
        "real_a": jax.random.uniform(k1, (cfg.batch_size, h, w, 3)),
        "seg_a": jax.random.uniform(k2, (cfg.batch_size, h, w, 3)),
        "mask_a": jax.nn.one_hot(mask_ids, cfg.segment_class),
    }


@pytest.mark.parametrize("mode_kw", [
    dict(loss_mode="p2p"),                       # reference active path, unet
    dict(loss_mode="sggan", use_resnet=True),    # full SG-GAN objective
    dict(loss_mode="p2p", use_pix2pix=True),     # pix2pix nets (BN state)
])
def test_train_step_runs_and_learns(mode_kw):
    cfg = tiny_cfg(**mode_kw)
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, donate=False)
    batch = make_batch(cfg, jax.random.PRNGKey(1))
    lr = jnp.float32(lr_schedule(cfg, 0))

    losses_g = []
    for i in range(5):
        state, m = step(state, batch, lr, jax.random.PRNGKey(i))
        assert np.isfinite(float(m["gen_loss"]))
        assert np.isfinite(float(m["disc_loss"]))
        losses_g.append(float(m["gen_loss"]))
    # L1(seg-fake) dominates the gen loss; repeated steps on a fixed batch
    # must reduce it.
    assert losses_g[-1] < losses_g[0]
    assert int(state.step) == 5


def test_compat_fake_history_dynamics():
    """compat_fake_history reproduces model.py:175-179: the fake history
    grows by the batch each step until count >= 10, then resets to one
    fresh batch; losses stay finite and the generator still learns."""
    cfg = tiny_cfg(loss_mode="p2p", compat_fake_history=True,
                   use_augmentation=False, batch_size=2)
    state = init_state(cfg, jax.random.PRNGKey(0))
    # buffer sized for the max prefix: 9 + effective batch
    assert state.pool.buffer.shape[0] == 9 + 2
    step = make_train_step(cfg, donate=False)
    batch = make_batch(cfg, jax.random.PRNGKey(1))
    counts = []
    for i in range(7):
        state, m = step(state, batch, jnp.float32(1e-3),
                        jax.random.PRNGKey(i))
        assert np.isfinite(float(m["gen_loss"]))
        assert np.isfinite(float(m["disc_loss"]))
        counts.append(int(state.pool.count))
    # grows 2,4,6,8,10 then resets to the fresh batch
    assert counts == [2, 4, 6, 8, 10, 2, 4]


def test_pool_pairs_stay_together():
    """Pytree pool entries are stored/swapped atomically: a historical
    fake must come back with the mask it was stored with."""
    state = pool_init(2, {"fake": (1,), "mask": (1,)})
    for v in range(20):
        items = {"fake": jnp.full((1, 1), float(v)),
                 "mask": jnp.full((1, 1), float(v))}
        state, out = pool_update(state, jax.random.PRNGKey(v), items)
        np.testing.assert_allclose(np.asarray(out["fake"]),
                                   np.asarray(out["mask"]))


def test_lr_schedule():
    cfg = tiny_cfg()  # compat override on by default
    assert lr_schedule(cfg, 0) == 1e-3
    cfg2 = cfg.replace(compat_lr_override=False, epoch=100, epoch_step=50,
                       lr=2e-4)
    assert lr_schedule(cfg2, 0) == 2e-4
    assert lr_schedule(cfg2, 49) == 2e-4
    np.testing.assert_allclose(lr_schedule(cfg2, 75), 2e-4 * 0.5)
    np.testing.assert_allclose(lr_schedule(cfg2, 100), 0.0)


def test_pool_fill_then_swap():
    state = pool_init(4, (2, 2, 1))
    items = jnp.arange(8, dtype=jnp.float32).reshape(2, 2, 2, 1)

    # filling phase: passthrough + store
    state, out = pool_update(state, jax.random.PRNGKey(0), items)
    np.testing.assert_allclose(np.asarray(out), np.asarray(items))
    assert int(state.count) == 2
    state, out = pool_update(state, jax.random.PRNGKey(1), items + 100)
    np.testing.assert_allclose(np.asarray(out), np.asarray(items) + 100)
    assert int(state.count) == 4

    # full: outputs are either the new items or historical entries
    buf_before = np.asarray(state.buffer)
    new_items = items + 1000
    hist_seen = passthrough_seen = False
    for seed in range(20):
        s2, out = pool_update(state, jax.random.PRNGKey(seed + 2), new_items)
        for b in range(2):
            o = np.asarray(out[b])
            if (o >= 1000).all():
                passthrough_seen = True
            else:
                hist_seen = True
                # historical output must be one of the stored entries
                assert any(np.allclose(o, buf_before[i]) for i in range(4))
    assert hist_seen and passthrough_seen
    assert int(s2.count) == 4


def test_pool_disabled():
    cfg = tiny_cfg(loss_mode="sggan", max_size=0)
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, donate=False)
    batch = make_batch(cfg, jax.random.PRNGKey(1))
    state, m = step(state, batch, jnp.float32(1e-3), jax.random.PRNGKey(2))
    assert np.isfinite(float(m["gen_loss"]))


def test_loss_mode_simple_runs_and_learns():
    """The reference's dormant 'simple' sce losses (model.py:135-147)
    wired for real: alpha_recip = 1/ratio_gan2seg weights the GAN term."""
    cfg = tiny_cfg(loss_mode="simple", ratio_gan2seg=10)
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, donate=False)
    batch = make_batch(cfg, jax.random.PRNGKey(1))
    gl = []
    for i in range(4):
        state, m = step(state, batch, jnp.float32(1e-3),
                        jax.random.PRNGKey(i))
        assert np.isfinite(float(m["gen_loss"]))
        gl.append(float(m["gen_loss"]))
    assert gl[-1] < gl[0]


def test_pool_compute_dtype_storage_is_exact():
    """The pool buffer is stored in the compute dtype (init_state): under
    bf16 training this must be OBSERVATIONALLY exact vs f32 storage,
    because every pooled entry is consumed by a discriminator forward
    that casts to bf16 anyway (bf16(stored bf16 x) == bf16(x)).  Run the
    same sggan steps from states differing only in pool-buffer dtype and
    require matching losses and parameters."""
    import jax
    import jax.numpy as jnp

    from sggan_tpu.config import Config
    from sggan_tpu.train.step import init_state, make_train_step

    cfg = Config(loss_mode="sggan", use_resnet=True, batch_size=2,
                 image_height=16, image_width=16, ngf=4, ndf=4,
                 segment_class=8, max_size=3, compute_dtype="bfloat16",
                 use_augmentation=False).validate()
    key = jax.random.PRNGKey(0)
    state_bf16 = init_state(cfg, key)
    assert jax.tree.leaves(state_bf16.pool.buffer)[0].dtype == jnp.bfloat16
    state_f32 = state_bf16._replace(pool=state_bf16.pool._replace(
        buffer=jax.tree.map(lambda a: a.astype(jnp.float32),
                            state_bf16.pool.buffer)))
    step = make_train_step(cfg, donate=False)
    rng = jax.random.PRNGKey(7)
    batch = {
        "real_a": jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3)),
        "seg_a": jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 3)),
        "mask_a": jax.nn.one_hot(
            jax.random.randint(jax.random.PRNGKey(3), (2, 2, 2), 0, 8),
            8).astype(jnp.float32),
    }
    lr = jnp.float32(1e-3)
    for i in range(6):  # past pool fill (3 slots, batch 2) into swap mode
        k = jax.random.fold_in(rng, i)
        state_bf16, m16 = step(state_bf16, batch, lr, k)
        state_f32, m32 = step(state_f32, batch, lr, k)
        np.testing.assert_allclose(float(m16["gen_loss"]),
                                   float(m32["gen_loss"]), rtol=1e-6)
        np.testing.assert_allclose(float(m16["disc_loss"]),
                                   float(m32["disc_loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(state_bf16.disc_params),
                    jax.tree.leaves(state_f32.disc_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
