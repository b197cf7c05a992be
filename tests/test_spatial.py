"""Spatial-sharding tests: every halo-exchange op and the full sharded
forwards must be numerically identical to the single-device versions."""

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
AX = "space"


def sp_mesh(n=4):
    return make_mesh(data=1, space=n)


def run_sharded(fn, mesh, arg_specs, out_spec, *args):
    mapped = jax.shard_map(fn, mesh=mesh, in_specs=arg_specs,
                           out_specs=out_spec, check_vma=False)
    return jax.jit(mapped)(*args)


SHARD_H = P(None, AX)  # shard axis 1 (H) of NHWC


@pytest.mark.parametrize("stride,k", [(1, 3), (2, 3), (1, 7)])
def test_conv2d_sp_matches(stride, k):
    mesh = sp_mesh()
    p = ops.conv2d_init(KEY, k, k, 3, 5)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 24, 3))
    ref = ops.conv2d(p, x, stride, "SAME")
    got = run_sharded(
        functools.partial(spatial.conv2d_sp, stride=stride, axis_name=AX),
        mesh, (P(), SHARD_H), SHARD_H, p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stride", [1, 2])
def test_conv2d_transpose_sp_matches(stride):
    mesh = sp_mesh()
    p = ops.conv2d_transpose_init(KEY, 3, 3, 4, 6)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 4))
    ref = ops.conv2d_transpose(p, x, stride, "SAME")
    got = run_sharded(
        functools.partial(spatial.conv2d_transpose_sp, stride=stride,
                          axis_name=AX),
        mesh, (P(), SHARD_H), SHARD_H, p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_instance_norm_sp_matches():
    mesh = sp_mesh()
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 8, 4)) * 2 + 1
    p = ops.instance_norm_init(4)
    ref = ops.instance_norm(p, x, act="leaky_relu", use_pallas=False)
    got = run_sharded(
        functools.partial(spatial.instance_norm_sp, axis_name=AX,
                          act="leaky_relu"),
        mesh, (P(), SHARD_H), SHARD_H, p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_reflect_pad_sp_then_valid_conv_matches():
    """reflect_pad_sp yields locally extended blocks for a following VALID
    conv — the composition must equal the global reflect-pad + VALID conv
    (the resnet generator's c7s1 and residual-block pattern)."""
    mesh = sp_mesh()
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 16, 8, 2))
    for pad, k in ((1, 3), (3, 7)):
        p = ops.conv2d_init(jax.random.PRNGKey(pad), k, k, 2, 3)
        ref = ops.conv2d(p, ops.reflect_pad(x, pad), 1, "VALID")

        def fn(p, x):
            xp = spatial.reflect_pad_sp(x, pad, AX)
            return spatial.conv2d_valid_after_reflect_sp(p, xp, AX)

        got = run_sharded(fn, mesh, (P(), SHARD_H), SHARD_H, p, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_generator_resnet_sp_matches():
    mesh = sp_mesh()
    p = generator_resnet.init(KEY, ngf=4)
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 32, 32, 3))
    ref = generator_resnet.apply(p, x)
    got = run_sharded(
        functools.partial(spatial.generator_resnet_sp, axis_name=AX),
        mesh, (P(), SHARD_H), SHARD_H, p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_discriminator_sp_matches_patch_head():
    mesh = sp_mesh(2)
    p = discriminator.init(KEY, ndf=4, n_class=6, image_size=(32, 32),
                           head="patch")
    x = jax.random.uniform(jax.random.PRNGKey(6), (1, 32, 32, 3))
    ids = jax.random.randint(jax.random.PRNGKey(7), (1, 4, 4), 0, 6)
    mask = jax.nn.one_hot(ids, 6)
    ref = discriminator.apply(p, x, mask, head="patch")
    got = run_sharded(
        functools.partial(spatial.discriminator_sp, axis_name=AX),
        mesh, (P(), SHARD_H, SHARD_H), SHARD_H, p, x, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_generator_unet_sp_matches():
    from sggan_tpu.models import generator_unet
    mesh = sp_mesh()
    p = generator_unet.init(KEY, ngf=4)
    x = jax.random.uniform(jax.random.PRNGKey(8), (1, 32, 32, 3))
    ref = generator_unet.apply(p, x, deterministic=True)
    got = run_sharded(
        functools.partial(spatial.generator_unet_sp, axis_name=AX),
        mesh, (P(), SHARD_H), SHARD_H, p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_conv2d_transpose_sp_k4_s2_matches():
    """The pix2pix 4x4 stride-2 upsample under the one-row-halo rule."""
    mesh = sp_mesh()
    p = ops.conv2d_transpose_init(KEY, 4, 4, 4, 6)
    x = jax.random.uniform(jax.random.PRNGKey(7), (1, 16, 16, 4))
    ref = ops.conv2d_transpose(p, x, 2, "SAME")
    got = run_sharded(
        functools.partial(spatial.conv2d_transpose_sp, stride=2,
                          axis_name=AX),
        mesh, (P(), SHARD_H), SHARD_H, p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv2d_sp_k4_s2_matches():
    """The pix2pix 4x4 stride-2 downsample (asymmetric SAME pads)."""
    mesh = sp_mesh()
    p = ops.conv2d_init(KEY, 4, 4, 3, 5)
    x = jax.random.uniform(jax.random.PRNGKey(8), (2, 16, 24, 3))
    ref = ops.conv2d(p, x, 2, "SAME")
    got = run_sharded(
        functools.partial(spatial.conv2d_sp, stride=2, axis_name=AX),
        mesh, (P(), SHARD_H), SHARD_H, p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_batch_norm_sp_matches():
    mesh = sp_mesh()
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 16, 8, 4)) * 3 + 2
    p = ops.batch_norm_init(4)
    ref, new_ref = ops.batch_norm(p, x, training=True)

    def fn(p_, x_):
        return spatial.batch_norm_sp(p_, x_, AX, training=True)

    got, new_got = run_sharded(fn, mesh, (P(), SHARD_H), (SHARD_H, P()),
                               p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_got["moving_var"]),
                               np.asarray(new_ref["moving_var"]),
                               rtol=1e-4, atol=1e-6)


def test_generator_unet_sp_matches_single_device():
    from sggan_tpu.models import generator_unet
    mesh = sp_mesh()
    params = generator_unet.init(KEY, ngf=4)
    x = jax.random.uniform(jax.random.PRNGKey(10), (1, 16, 16, 3))
    ref = generator_unet.apply(params, x)  # deterministic

    def fn(p_, x_):
        return spatial.generator_unet_sp(p_, x_, AX)

    got = run_sharded(fn, mesh, (P(), SHARD_H), SHARD_H, params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_generator_pix2pix_sp_matches_single_device():
    from sggan_tpu.models import generator_pix2pix
    mesh = sp_mesh(2)
    params, state = generator_pix2pix.init(KEY, ngf=4, image_size=32)
    x = jax.random.uniform(jax.random.PRNGKey(11), (1, 32, 32, 3))
    ref, _ = generator_pix2pix.apply(params, state, x, ngf=4)

    def fn(p_, s_, x_):
        y, new_s = spatial.generator_pix2pix_sp(p_, s_, x_, AX, ngf=4)
        return y

    got = run_sharded(fn, mesh, (P(), P(), SHARD_H), SHARD_H,
                      params, state, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_discriminator_pix2pix_sp_matches_single_device():
    from sggan_tpu.models import discriminator_pix2pix
    mesh = sp_mesh(2)
    params, state = discriminator_pix2pix.init(KEY, ndf=4)
    a = jax.random.uniform(jax.random.PRNGKey(12), (1, 32, 32, 3))
    b = jax.random.uniform(jax.random.PRNGKey(13), (1, 32, 32, 3))
    ref, _ = discriminator_pix2pix.apply(params, state, a, b)

    def fn(p_, s_, a_, b_):
        y, _ = spatial.discriminator_pix2pix_sp(p_, s_, a_, b_, AX)
        return y

    got = run_sharded(fn, mesh, (P(), P(), SHARD_H, SHARD_H), P(),
                      params, state, a, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
