"""2-D spatial shard grid (H over ``space`` x W over ``wspace``): every op
and forward must be numerically identical to the single-device versions,
and the full (data x space x wspace) train step must match the 1-D
(data x space) step exactly (same rng, same batch)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from sggan_tpu import ops
from sggan_tpu.models import discriminator, generator_resnet
from sggan_tpu.parallel import make_mesh, spatial

KEY = jax.random.PRNGKey(0)
AX, AXW = "space", "wspace"
SHARD_HW = P(None, AX, AXW)  # shard H and W of NHWC


def grid_mesh(space=2, wspace=2):
    return make_mesh(data=1, space=space, wspace=wspace)


def run_sharded(fn, mesh, arg_specs, out_spec, *args):
    mapped = jax.shard_map(fn, mesh=mesh, in_specs=arg_specs,
                           out_specs=out_spec, check_vma=False)
    return jax.jit(mapped)(*args)


@pytest.mark.parametrize("stride,k", [(1, 3), (2, 3), (1, 7), (2, 4)])
def test_conv2d_2d_grid_matches(stride, k):
    mesh = grid_mesh()
    p = ops.conv2d_init(KEY, k, k, 3, 5)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 24, 3))
    ref = ops.conv2d(p, x, stride, "SAME")
    got = run_sharded(
        functools.partial(spatial.conv2d_sp, stride=stride, axis_name=AX,
                          axis_w=AXW),
        mesh, (P(), SHARD_HW), SHARD_HW, p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stride,k", [(1, 3), (2, 3), (2, 4)])
def test_conv2d_transpose_2d_grid_matches(stride, k):
    mesh = grid_mesh()
    p = ops.conv2d_transpose_init(KEY, k, k, 4, 6)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 24, 4))
    ref = ops.conv2d_transpose(p, x, stride, "SAME")
    got = run_sharded(
        functools.partial(spatial.conv2d_transpose_sp, stride=stride,
                          axis_name=AX, axis_w=AXW),
        mesh, (P(), SHARD_HW), SHARD_HW, p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_instance_norm_2d_grid_matches():
    mesh = grid_mesh()
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 8, 4)) * 2 + 1
    p = ops.instance_norm_init(4)
    ref = ops.instance_norm(p, x, act="leaky_relu", use_pallas=False)
    got = run_sharded(
        functools.partial(spatial.instance_norm_sp, axis_name=AX,
                          act="leaky_relu", axis_w=AXW),
        mesh, (P(), SHARD_HW), SHARD_HW, p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_batch_norm_2d_grid_matches():
    mesh = grid_mesh()
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 16, 8, 4)) * 3 + 2
    p = ops.batch_norm_init(4)
    ref, new_ref = ops.batch_norm(p, x, training=True)

    def fn(p_, x_):
        return spatial.batch_norm_sp(p_, x_, AX, training=True, axis_w=AXW)

    got, new_got = run_sharded(fn, mesh, (P(), SHARD_HW), (SHARD_HW, P()),
                               p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_got["moving_var"]),
                               np.asarray(new_ref["moving_var"]),
                               rtol=1e-4, atol=1e-6)


def test_reflect_pad_2d_grid_then_valid_conv_matches():
    """Corner correctness: the H-then-W exchange order must reproduce the
    global reflect pad including the diagonal-neighbour corners."""
    mesh = grid_mesh()
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 16, 16, 2))
    for pad, k in ((1, 3), (3, 7)):
        p = ops.conv2d_init(jax.random.PRNGKey(pad), k, k, 2, 3)
        ref = ops.conv2d(p, ops.reflect_pad(x, pad), 1, "VALID")

        def fn(p_, x_):
            xp = spatial.reflect_pad_sp(x_, pad, AX, axis_w=AXW)
            return spatial.conv2d_valid_after_reflect_sp(p_, xp, AX)

        got = run_sharded(fn, mesh, (P(), SHARD_HW), SHARD_HW, p, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_seg_boundary_weight_2d_grid_matches():
    from sggan_tpu.ops.deriv import seg_boundary_weight
    mesh = grid_mesh()
    seg = jax.random.uniform(jax.random.PRNGKey(5), (1, 16, 16, 3))
    ref = seg_boundary_weight(seg)
    got = run_sharded(
        functools.partial(spatial.seg_boundary_weight_sp, axis_name=AX,
                          axis_w=AXW),
        mesh, (SHARD_HW,), SHARD_HW, seg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_generator_resnet_2d_grid_matches():
    mesh = grid_mesh()
    p = generator_resnet.init(KEY, ngf=4)
    x = jax.random.uniform(jax.random.PRNGKey(6), (1, 32, 32, 3))
    ref = generator_resnet.apply(p, x)
    got = run_sharded(
        functools.partial(spatial.generator_resnet_sp, axis_name=AX,
                          axis_w=AXW),
        mesh, (P(), SHARD_HW), SHARD_HW, p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_generator_unet_2d_grid_matches():
    from sggan_tpu.models import generator_unet
    mesh = grid_mesh()
    p = generator_unet.init(KEY, ngf=4)
    x = jax.random.uniform(jax.random.PRNGKey(7), (1, 16, 16, 3))
    ref = generator_unet.apply(p, x, deterministic=True)
    got = run_sharded(
        functools.partial(spatial.generator_unet_sp, axis_name=AX,
                          axis_w=AXW),
        mesh, (P(), SHARD_HW), SHARD_HW, p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_discriminator_2d_grid_matches():
    mesh = grid_mesh()
    p = discriminator.init(KEY, ndf=4, n_class=6, image_size=(32, 32),
                           head="patch")
    x = jax.random.uniform(jax.random.PRNGKey(8), (1, 32, 32, 3))
    ids = jax.random.randint(jax.random.PRNGKey(9), (1, 4, 4), 0, 6)
    mask = jax.nn.one_hot(ids, 6)
    ref = discriminator.apply(p, x, mask, head="patch")
    got = run_sharded(
        functools.partial(spatial.discriminator_sp, axis_name=AX,
                          axis_w=AXW),
        mesh, (P(), SHARD_HW, SHARD_HW), SHARD_HW, p, x, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


# ------------------------------------------------- full train step on a grid

def _mk_cfg(**kw):
    from sggan_tpu.config import Config
    base = dict(image_height=32, image_width=32, ngf=4, ndf=4,
                segment_class=8, batch_size=2, max_size=2,
                loss_mode="sggan", use_resnet=True,
                compute_dtype="float32", donate=False)
    base.update(kw)
    return Config(**base)


def _mk_batch(cfg, key):
    hm, wm = cfg.mask_hw
    b, h, w = cfg.batch_size, cfg.image_height, cfg.image_width
    return {
        "real_a": jax.random.uniform(key, (b, h, w, 3)),
        "seg_a": jax.random.uniform(jax.random.fold_in(key, 1),
                                    (b, h, w, 3)),
        "mask_a": jax.nn.one_hot(
            jax.random.randint(jax.random.fold_in(key, 2),
                               (b, hm, wm), 0, 8), 8),
    }


def test_sp_step_2d_grid_matches_1d_losses():
    """One (data=2, space=2, wspace=2) step == one (data=2, space=4) step:
    same rng, same batch, same losses.  (Updated params are NOT compared —
    Adam's g/(sqrt(v)+eps) amplifies reduction-order float noise without
    bound for eps-scale gradients; gradient equality is asserted
    separately below.)"""
    from sggan_tpu.parallel.spatial_step import (init_sp_state,
                                                 make_sp_train_step,
                                                 place_sp, shard_sp_batch)
    cfg = _mk_cfg(Lg_lambda=1.0)
    batch = _mk_batch(cfg, jax.random.PRNGKey(11))
    lr = jnp.float32(1e-3)
    rng = jax.random.PRNGKey(12)

    results = []
    for mesh in (make_mesh(data=2, space=4),
                 make_mesh(data=2, space=2, wspace=2)):
        state = place_sp(init_sp_state(cfg, jax.random.PRNGKey(10),
                                       n_data=2), mesh)
        step = make_sp_train_step(cfg, mesh, donate=False)
        new_state, metrics = step(state, shard_sp_batch(batch, mesh),
                                  lr, rng)
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree.leaves(new_state.gen_params))
        results.append((float(metrics["gen_loss"]),
                        float(metrics["disc_loss"])))

    (gl1, dl1), (gl2, dl2) = results
    assert np.isfinite(gl1) and np.isfinite(dl1)
    np.testing.assert_allclose(gl2, gl1, rtol=1e-5)
    np.testing.assert_allclose(dl2, dl1, rtol=1e-5)


def test_sp_gen_grads_2d_grid_match_single_device():
    """The pmean'd generator gradient on the 2-D shard grid equals the
    single-device gradient of the same loss (GAN + L1 + Lg)."""
    from sggan_tpu import losses
    from sggan_tpu.models import generator_resnet as gen
    from sggan_tpu.models import discriminator as disc
    from sggan_tpu.ops.deriv import seg_boundary_weight, tf_deriv

    gp = gen.init(jax.random.PRNGKey(20), ngf=4)
    dp = disc.init(jax.random.PRNGKey(21), ndf=4, n_class=8,
                   image_size=(32, 32), head="patch")
    real = jax.random.uniform(jax.random.PRNGKey(22), (1, 32, 32, 3))
    mask = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(23), (1, 4, 4), 0, 8), 8)
    crit = losses.criterion_gan(False)

    def gradloss_conv(in_, target, weight):
        # conv-Sobel formulation, identical op order to the sharded
        # gradloss_criterion_sp (the shift-based losses.gradloss_criterion
        # is numerically equal forward but its backward picks different
        # |x| subgradients at float-noise-level kinks)
        d = jnp.abs(jnp.abs(tf_deriv(in_)) - jnp.abs(tf_deriv(target)))
        d = jnp.mean(d, axis=-1, keepdims=True)
        return jnp.mean(weight * d)

    def loss_ref(gp_):
        fake = gen.apply(gp_, real)
        da = disc.apply(dp, fake, mask, head="patch")
        w = seg_boundary_weight(real)
        return (crit(da, jnp.ones_like(da))
                + 10.0 * losses.abs_criterion(real, fake)
                + 1.0 * gradloss_conv(fake, real, w))

    ref_grads = jax.grad(loss_ref)(gp)

    def loss_sp(gp_, real_, mask_):
        # LOCAL mean loss — the spatial_step contract: grad the local
        # loss, then pmean the grads once (equal shard sizes)
        fake = spatial.generator_resnet_sp(gp_, real_, AX, axis_w=AXW)
        da = spatial.discriminator_sp(dp, fake, mask_, AX, axis_w=AXW)
        w = spatial.seg_boundary_weight_sp(real_, AX, axis_w=AXW)
        return (crit(da, jnp.ones_like(da))
                + 10.0 * losses.abs_criterion(real_, fake)
                + 1.0 * spatial.gradloss_criterion_sp(fake, real_, w, AX,
                                                      axis_w=AXW))

    def grads_sp(gp_, real_, mask_):
        return jax.lax.pmean(jax.grad(loss_sp)(gp_, real_, mask_),
                             (AX, AXW))

    mesh = grid_mesh()
    got = run_sharded(grads_sp, mesh, (P(), SHARD_HW, SHARD_HW), P(),
                      gp, real, mask)
    # Norm-relative criterion per leaf.  Element-wise comparison is the
    # wrong tool here: conv biases that feed an instance norm have a
    # mathematically ZERO loss gradient (IN subtracts the mean), so both
    # sides compute ~1e-8 float residue with O(1) relative spread; and
    # deep-chain grads accumulate reduction-order noise.  A float64 run
    # (same comparison) bounds the residue at ||diff|| ~1e-8 — structure
    # errors (wrong halo/psum) show up as rel ~O(1) on LARGE-norm leaves.
    key = lambda kv: str(kv[0])
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(ref_grads), key=key),
            sorted(jax.tree_util.tree_leaves_with_path(got), key=key)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        dn = np.linalg.norm(b - a)
        assert dn <= 1e-5 + 1e-3 * np.linalg.norm(a), (
            f"{ka}: ||diff||={dn:.3e} vs ||ref||={np.linalg.norm(a):.3e}")


def test_config_validates_mesh_space_w():
    import pytest as _pytest
    from sggan_tpu.config import Config
    Config(image_height=32, image_width=32, mesh_space=2, mesh_space_w=2,
           loss_mode="sggan", use_resnet=True,
           use_augmentation=False).validate()
    with _pytest.raises(ValueError, match="mesh_space_w"):
        Config(image_height=32, image_width=32, mesh_space_w=2,
               use_augmentation=False).validate()
    with _pytest.raises(ValueError, match="mesh_space_w"):
        # 48 / 4 = 12 columns per shard, not a multiple of 8
        Config(image_height=32, image_width=48, mesh_space=2,
               mesh_space_w=4, loss_mode="sggan", use_resnet=True,
               use_augmentation=False).validate()


def test_generator_pix2pix_2d_grid_matches():
    from sggan_tpu.models import generator_pix2pix
    mesh = grid_mesh()
    params, state = generator_pix2pix.init(KEY, ngf=4, image_size=32)
    x = jax.random.uniform(jax.random.PRNGKey(14), (1, 32, 32, 3))
    ref, _ = generator_pix2pix.apply(params, state, x, ngf=4)

    def fn(p_, s_, x_):
        y, _ = spatial.generator_pix2pix_sp(p_, s_, x_, AX, ngf=4,
                                            axis_w=AXW)
        return y

    got = run_sharded(fn, mesh, (P(), P(), SHARD_HW), SHARD_HW,
                      params, state, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_discriminator_pix2pix_2d_grid_matches():
    from sggan_tpu.models import discriminator_pix2pix
    mesh = grid_mesh()
    params, state = discriminator_pix2pix.init(KEY, ndf=4)
    a = jax.random.uniform(jax.random.PRNGKey(15), (1, 32, 32, 3))
    b = jax.random.uniform(jax.random.PRNGKey(16), (1, 32, 32, 3))
    ref, _ = discriminator_pix2pix.apply(params, state, a, b)

    def fn(p_, s_, a_, b_):
        y, _ = spatial.discriminator_pix2pix_sp(p_, s_, a_, b_, AX,
                                                axis_w=AXW)
        return y

    got = run_sharded(fn, mesh, (P(), P(), SHARD_HW, SHARD_HW), P(),
                      params, state, a, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_sp_step_pix2pix_2d_grid_matches_1d_losses():
    """The p2p/pix2pix step on a (data=2, space=2, wspace=2) grid matches
    the (data=2, space=4) step losses.  keras_quirk keeps dropout off
    (per-shard dropout keys legitimately differ between mesh shapes); BN
    training moments are covered by test_batch_norm_2d_grid_matches."""
    from sggan_tpu.parallel.spatial_step import (init_sp_state,
                                                 make_sp_train_step,
                                                 place_sp, shard_sp_batch)
    cfg = _mk_cfg(loss_mode="p2p", use_resnet=False, use_pix2pix=True,
                  dropout_mode="keras_quirk")
    batch = _mk_batch(cfg, jax.random.PRNGKey(17))
    lr = jnp.float32(1e-3)
    rng = jax.random.PRNGKey(18)

    results = []
    for mesh in (make_mesh(data=2, space=4),
                 make_mesh(data=2, space=2, wspace=2)):
        state = place_sp(init_sp_state(cfg, jax.random.PRNGKey(10),
                                       n_data=2), mesh)
        step = make_sp_train_step(cfg, mesh, donate=False)
        _, metrics = step(state, shard_sp_batch(batch, mesh), lr, rng)
        results.append((float(metrics["gen_loss"]),
                        float(metrics["disc_loss"])))

    (gl1, dl1), (gl2, dl2) = results
    assert np.isfinite(gl1) and np.isfinite(dl1)
    np.testing.assert_allclose(gl2, gl1, rtol=1e-5)
    np.testing.assert_allclose(dl2, dl1, rtol=1e-5)
