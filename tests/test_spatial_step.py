"""The 2-D (data x space) sharded train step must match a single-device
step computing the same global objective."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sggan_tpu import losses
from sggan_tpu.config import Config
from sggan_tpu.models import discriminator, generator_resnet
from sggan_tpu.ops.deriv import seg_boundary_weight
from sggan_tpu.parallel import make_mesh
from sggan_tpu.parallel.spatial_step import (init_sp_state,
                                             make_sp_train_step, place_sp,
                                             shard_sp_batch)
from sggan_tpu.train.step import _tx


def cfg_(**kw):
    base = dict(image_height=32, image_width=32, ngf=4, ndf=4,
                segment_class=8, batch_size=4, max_size=0,
                compute_dtype="float32", loss_mode="sggan", use_resnet=True,
                L1_lambda=10.0, Lg_lambda=5.0, use_lsgan=True)
    base.update(kw)
    return Config(**base)


def make_batch(cfg, key):
    k1, k2, k3 = jax.random.split(key, 3)
    b, h, w = cfg.batch_size, cfg.image_height, cfg.image_width
    hm, wm = cfg.mask_hw
    ids = jax.random.randint(k3, (b, hm, wm), 0, cfg.segment_class)
    return {"real_a": jax.random.uniform(k1, (b, h, w, 3)),
            "seg_a": jax.random.uniform(k2, (b, h, w, 3)),
            "mask_a": jax.nn.one_hot(ids, cfg.segment_class)}


def single_device_step(cfg, state, batch, lr):
    """Same objective, unsharded ops (patch-head discriminator)."""
    crit = losses.criterion_gan(cfg.use_lsgan)
    real_a = batch["real_a"].astype(jnp.float32)
    seg_a = batch["seg_a"].astype(jnp.float32)
    mask_a = batch["mask_a"]
    w_a = seg_boundary_weight(seg_a)
    tx = _tx(cfg.beta1)

    def gen_loss_fn(gp):
        fake = generator_resnet.apply(gp, real_a)
        da_fake = discriminator.apply(state.disc_params, fake, mask_a,
                                      head="patch")
        g = crit(da_fake, jnp.ones_like(da_fake))
        g = g + cfg.L1_lambda * losses.abs_criterion(real_a, fake)
        g = g + cfg.Lg_lambda * losses.gradloss_criterion(fake, real_a, w_a)
        return g, fake

    (g_loss, fake), g_grads = jax.value_and_grad(
        gen_loss_fn, has_aux=True)(state.gen_params)
    fake_sg = jax.lax.stop_gradient(fake)

    def disc_loss_fn(dp):
        da_real = discriminator.apply(dp, seg_a, mask_a, head="patch")
        da_fake = discriminator.apply(dp, fake_sg, mask_a, head="patch")
        return losses.disc_loss_sggan(da_real, da_fake,
                                      use_lsgan=cfg.use_lsgan)

    d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(state.disc_params)

    g_upd, _ = tx.update(g_grads, state.g_opt, state.gen_params)
    gen_params = optax.apply_updates(
        state.gen_params, jax.tree.map(lambda u: -lr * u, g_upd))
    d_upd, _ = tx.update(d_grads, state.d_opt, state.disc_params)
    disc_params = optax.apply_updates(
        state.disc_params, jax.tree.map(lambda u: -lr * u, d_upd))
    return gen_params, disc_params, g_loss, d_loss


def test_sp_step_matches_single_device():
    cfg = cfg_()
    mesh = make_mesh(data=2, space=2, devices=jax.devices()[:4])
    state0 = init_sp_state(cfg, jax.random.PRNGKey(0), n_data=2)
    batch = make_batch(cfg, jax.random.PRNGKey(1))
    lr = jnp.float32(1e-3)

    gen_ref, disc_ref, g_ref, d_ref = single_device_step(
        cfg, state0, batch, lr)

    step = make_sp_train_step(cfg, mesh, donate=False)
    state_sp = place_sp(state0, mesh)
    out, m = step(state_sp, shard_sp_batch(batch, mesh), lr,
                  jax.random.PRNGKey(2))

    np.testing.assert_allclose(float(m["gen_loss"]), float(g_ref),
                               rtol=2e-4)
    np.testing.assert_allclose(float(m["disc_loss"]), float(d_ref),
                               rtol=2e-4)
    # NOTE: post-Adam params are NOT compared directly — a single Adam
    # step is ~ -lr*sign(g), so fp noise on near-zero gradients flips
    # whole update elements.  Gradients are compared in
    # test_sp_gradients_match_single_device below.
    assert int(out.step) == 1


def test_sp_gradients_match_single_device():
    """Differentiate *through* shard_map: the spatially-sharded global
    generator loss must produce the same parameter gradients as the
    single-device computation (halo/psum transposes included)."""
    from sggan_tpu.parallel.spatial_step import BATCH_SPEC
    from jax.sharding import PartitionSpec as P
    from sggan_tpu.parallel import spatial

    cfg = cfg_()
    mesh = make_mesh(data=2, space=2, devices=jax.devices()[:4])
    state = init_sp_state(cfg, jax.random.PRNGKey(0), n_data=2)
    batch = make_batch(cfg, jax.random.PRNGKey(1))
    crit = losses.criterion_gan(cfg.use_lsgan)

    def local_loss(gp, batch):
        real_a = batch["real_a"].astype(jnp.float32)
        seg_a = batch["seg_a"].astype(jnp.float32)
        w_a = spatial.seg_boundary_weight_sp(seg_a, "space")
        fake = spatial.generator_resnet_sp(gp, real_a, "space")
        da = spatial.discriminator_sp(state.disc_params, fake,
                                      batch["mask_a"], "space")
        g = crit(da, jnp.ones_like(da))
        g = g + cfg.L1_lambda * losses.abs_criterion(real_a, fake)
        g = g + cfg.Lg_lambda * spatial.gradloss_criterion_sp(
            fake, real_a, w_a, "space")
        return jax.lax.pmean(g, ("data", "space"))

    sp_loss = jax.shard_map(local_loss, mesh=mesh,
                            in_specs=(P(), BATCH_SPEC), out_specs=P(),
                            check_vma=False)
    g_sp = jax.jit(jax.grad(lambda gp: sp_loss(gp, batch)))(
        state.gen_params)

    def ref_loss(gp):
        real_a = batch["real_a"].astype(jnp.float32)
        seg_a = batch["seg_a"].astype(jnp.float32)
        w_a = seg_boundary_weight(seg_a)
        fake = generator_resnet.apply(gp, real_a)
        da = discriminator.apply(state.disc_params, fake, batch["mask_a"],
                                 head="patch")
        g = crit(da, jnp.ones_like(da))
        g = g + cfg.L1_lambda * losses.abs_criterion(real_a, fake)
        g = g + cfg.Lg_lambda * losses.gradloss_criterion(fake, real_a, w_a)
        return g

    g_ref = jax.jit(jax.grad(ref_loss))(state.gen_params)
    for a, b in zip(jax.tree_util.tree_leaves(g_sp),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)


def test_sp_step_with_pool_runs_multi_step():
    cfg = cfg_(max_size=2, batch_size=8)
    mesh = make_mesh(data=4, space=2)
    state = place_sp(init_sp_state(cfg, jax.random.PRNGKey(0), n_data=4),
                     mesh)
    assert state.pool.buffer["fake"].shape == (8, 32, 32, 3)
    assert state.pool.buffer["mask"].shape[0] == 8
    step = make_sp_train_step(cfg, mesh, donate=False)
    batch = shard_sp_batch(make_batch(cfg, jax.random.PRNGKey(1)), mesh)
    for i in range(3):
        state, m = step(state, batch, jnp.float32(1e-3),
                        jax.random.PRNGKey(i))
        assert np.isfinite(float(m["gen_loss"]))
    assert int(state.step) == 3


def test_sp_step_unet_runs():
    """sggan objective with the unet generator on a (data x space) mesh
    (dropout keyed per space shard)."""
    cfg = cfg_(use_resnet=False, max_size=2, batch_size=4,
               dropout_mode="intended")
    mesh = make_mesh(data=2, space=2)
    state = place_sp(init_sp_state(cfg, jax.random.PRNGKey(0), n_data=2),
                     mesh)
    step = make_sp_train_step(cfg, mesh, donate=False)
    batch = shard_sp_batch(make_batch(cfg, jax.random.PRNGKey(1)), mesh)
    for i in range(2):
        state, m = step(state, batch, jnp.float32(1e-3),
                        jax.random.PRNGKey(i))
        assert np.isfinite(float(m["gen_loss"]))
        assert np.isfinite(float(m["disc_loss"]))
    assert int(state.step) == 2


def test_sp_step_pix2pix_runs():
    """p2p objective with the pix2pix nets on a (data x space) mesh —
    BN state threads through psum'd spatial moments."""
    cfg = cfg_(loss_mode="p2p", use_resnet=False, use_pix2pix=True,
               image_height=32, image_width=32, batch_size=4)
    mesh = make_mesh(data=2, space=2)
    state = place_sp(init_sp_state(cfg, jax.random.PRNGKey(0), n_data=2),
                     mesh)
    step = make_sp_train_step(cfg, mesh, donate=False)
    batch = shard_sp_batch(make_batch(cfg, jax.random.PRNGKey(1)), mesh)
    gl = []
    for i in range(3):
        state, m = step(state, batch, jnp.float32(1e-3),
                        jax.random.PRNGKey(i))
        assert np.isfinite(float(m["gen_loss"]))
        assert np.isfinite(float(m["disc_loss"]))
        gl.append(float(m["gen_loss"]))
    assert gl[-1] < gl[0]
    # BN moving stats moved (train path exercised)
    mv = np.asarray(jax.device_get(state.gen_bn["up0_bn"]["moving_mean"]))
    assert not np.allclose(mv, 0.0)


# ---------------------------------------------------------------- cycle

def cycle_cfg_(**kw):
    base = dict(image_height=32, image_width=32, ngf=4, ndf=4,
                segment_class=8, batch_size=2, max_size=0,
                compute_dtype="float32", loss_mode="cycle",
                use_resnet=True, L1_lambda=10.0, Lg_lambda=5.0,
                identity_lambda=5.0, use_lsgan=True)
    base.update(kw)
    return Config(**base)


def make_cycle_batch(cfg, key):
    ks = jax.random.split(key, 6)
    b, h, w = cfg.batch_size, cfg.image_height, cfg.image_width
    hm, wm = cfg.mask_hw

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


def single_device_cycle_losses(cfg, state, batch):
    """The cycle objective (train/cycle.py) computed unsharded with the
    spatial step's patch-head discriminators; pool off (max_size=0)."""
    crit = losses.criterion_gan(cfg.use_lsgan)
    real_a = batch["real_a"].astype(jnp.float32)
    real_b = batch["real_b"].astype(jnp.float32)
    w_a = seg_boundary_weight(batch["seg_a"])
    w_b = seg_boundary_weight(batch["seg_b"])
    mask_a, mask_b = batch["mask_a"], batch["mask_b"]
    gp, dp = state.gen_params, state.disc_params
    g_ap = lambda p, x: generator_resnet.apply(p, x)
    d_ap = lambda p, x, m: discriminator.apply(p, x, m, head="patch")

    fake_b = g_ap(gp["a2b"], real_a)
    fake_a = g_ap(gp["b2a"], real_b)
    cyc_a = g_ap(gp["b2a"], fake_b)
    cyc_b = g_ap(gp["a2b"], fake_a)
    d_fake_b = d_ap(dp["db"], fake_b, mask_a)
    d_fake_a = d_ap(dp["da"], fake_a, mask_b)
    g = crit(d_fake_b, jnp.ones_like(d_fake_b)) \
        + crit(d_fake_a, jnp.ones_like(d_fake_a))
    g += cfg.L1_lambda * (losses.abs_criterion(real_a, cyc_a)
                          + losses.abs_criterion(real_b, cyc_b))
    idt_b, idt_a = g_ap(gp["a2b"], real_b), g_ap(gp["b2a"], real_a)
    g += cfg.identity_lambda * (losses.abs_criterion(idt_b, real_b)
                                + losses.abs_criterion(idt_a, real_a))
    g += cfg.Lg_lambda * (losses.gradloss_criterion(fake_b, real_a, w_a)
                          + losses.gradloss_criterion(fake_a, real_b, w_b))
    d_real_a, d_real_b = d_ap(dp["da"], real_a, mask_a), \
        d_ap(dp["db"], real_b, mask_b)
    da = (crit(d_real_a, jnp.ones_like(d_real_a))
          + crit(d_fake_a, jnp.zeros_like(d_fake_a))) / 2.0
    db = (crit(d_real_b, jnp.ones_like(d_real_b))
          + crit(d_fake_b, jnp.zeros_like(d_fake_b))) / 2.0
    return g, da + db


def test_sp_cycle_step_matches_single_device():
    """The spatially sharded cycle step (4 halo'd generator forwards +
    2 identity forwards + 4 patch-head D calls per step) must reproduce
    the single-device cycle objective."""
    from sggan_tpu.parallel.spatial_step import init_sp_cycle_state

    cfg = cycle_cfg_()
    mesh = make_mesh(data=2, space=2, devices=jax.devices()[:4])
    state0 = init_sp_cycle_state(cfg, jax.random.PRNGKey(0), n_data=2)
    batch = make_cycle_batch(cfg, jax.random.PRNGKey(1))

    g_ref, d_ref = single_device_cycle_losses(cfg, state0, batch)

    step = make_sp_train_step(cfg, mesh, donate=False)
    state_sp = place_sp(state0, mesh)
    out, m = step(state_sp, shard_sp_batch(batch, mesh),
                  jnp.float32(1e-3), jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(m["gen_loss"]), float(g_ref),
                               rtol=2e-4)
    np.testing.assert_allclose(float(m["disc_loss"]), float(d_ref),
                               rtol=2e-4)
    assert int(out.step) == 1


def test_sp_cycle_pool_and_wspace_multi_step():
    """Cycle on the 2-D (data x space x wspace) grid with the image pool
    on: (slot, 2, H, W, C) pair buffers shard their plane, losses stay
    finite over several steps."""
    from sggan_tpu.parallel.spatial_step import init_sp_cycle_state

    cfg = cycle_cfg_(max_size=2, image_height=32, image_width=64,
                     batch_size=2)
    mesh = make_mesh(data=2, space=2, wspace=2,
                     devices=jax.devices()[:8])
    state = place_sp(init_sp_cycle_state(cfg, jax.random.PRNGKey(0),
                                         n_data=2), mesh)
    assert state.pool.buffer["fakes"].shape == (4, 2, 32, 64, 3)
    step = make_sp_train_step(cfg, mesh, donate=False)
    for i in range(3):
        batch = shard_sp_batch(
            make_cycle_batch(cfg, jax.random.PRNGKey(10 + i)), mesh)
        state, m = step(state, batch, jnp.float32(1e-3),
                        jax.random.PRNGKey(i))
        assert np.isfinite(float(m["gen_loss"]))
        assert np.isfinite(float(m["disc_loss"]))
    assert int(state.step) == 3
