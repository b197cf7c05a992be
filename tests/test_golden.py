"""Golden regression tests: fixed-seed model outputs pinned to stored
fixtures, guarding against silent numerics drift in refactors (the closest
substitute for TF-checkpoint pixel parity until reference weights are
imported via utils/tf_weights.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sggan_tpu.models import (discriminator, generator_pix2pix,
                              generator_resnet, generator_unet)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _case(name):
    key = jax.random.PRNGKey(42)
    kx = jax.random.PRNGKey(7)
    if name == "resnet":
        p = generator_resnet.init(key, ngf=8)
        x = jax.random.uniform(kx, (1, 32, 32, 3))
        return generator_resnet.apply(p, x)
    if name == "unet":
        p = generator_unet.init(key, ngf=4)
        x = jax.random.uniform(kx, (1, 16, 16, 3))
        return generator_unet.apply(p, x, deterministic=True)
    if name == "pix2pix":
        p, st = generator_pix2pix.init(key, ngf=4, image_size=32)
        x = jax.random.uniform(kx, (1, 32, 32, 3))
        y, _ = generator_pix2pix.apply(p, st, x, ngf=4)
        return y
    if name == "disc":
        p = discriminator.init(key, ndf=8, n_class=6, image_size=(32, 32),
                               head="patch")
        x = jax.random.uniform(kx, (1, 32, 32, 3))
        mask = jax.nn.one_hot(
            jax.random.randint(jax.random.PRNGKey(3), (1, 4, 4), 0, 6), 6)
        return discriminator.apply(p, x, mask, head="patch")
    raise KeyError(name)


@pytest.mark.parametrize("name", ["resnet", "unet", "pix2pix", "disc"])
def test_golden(name):
    path = os.path.join(GOLDEN, f"{name}.npy")
    got = np.asarray(_case(name), np.float32)
    if not os.path.exists(path):
        os.makedirs(GOLDEN, exist_ok=True)
        np.save(path, got)
        pytest.skip(f"golden fixture created: {path}")
    expect = np.load(path)
    np.testing.assert_allclose(got, expect, rtol=2e-3, atol=2e-4)
