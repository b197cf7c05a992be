"""Pallas kernel tests (interpreter mode on CPU): the fused instance-norm
kernel must match the XLA reference bit-for-bit-ish, including gradients."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from sggan_tpu.ops import pallas_in
from sggan_tpu.ops.norm import _instance_norm_xla


@pytest.mark.parametrize("shape,act", [
    ((2, 8, 8, 64), None),
    ((1, 16, 8, 128), "leaky_relu"),
    ((2, 8, 4, 256), "relu"),
    ((1, 4, 4, 34), None),           # non-128-multiple channel count
])
def test_pallas_in_matches_xla(shape, act):
    x = jax.random.normal(jax.random.PRNGKey(0), shape) * 2 + 0.5
    c = shape[-1]
    gamma = jax.random.uniform(jax.random.PRNGKey(1), (c,), minval=0.5,
                               maxval=1.5)
    beta = jax.random.normal(jax.random.PRNGKey(2), (c,)) * 0.1
    with pltpu.force_tpu_interpret_mode():
        got = pallas_in.instance_norm_pallas(x, gamma, beta, 1e-3, act, 0.3)
    ref = _instance_norm_xla(x, gamma, beta, 1e-3, act, 0.3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_in_bf16():
    x = (jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 128))
         .astype(jnp.bfloat16))
    gamma, beta = jnp.ones((128,)), jnp.zeros((128,))
    with pltpu.force_tpu_interpret_mode():
        got = pallas_in.instance_norm_pallas(x, gamma, beta, 1e-3,
                                             "leaky_relu", 0.3)
    assert got.dtype == jnp.bfloat16
    ref = _instance_norm_xla(x, gamma, beta, 1e-3, "leaky_relu", 0.3)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_pallas_in_gradient_matches():
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, 64))
    gamma = jnp.full((64,), 1.2)
    beta = jnp.full((64,), -0.1)

    def loss_pallas(x, g, b):
        with pltpu.force_tpu_interpret_mode():
            y = pallas_in.instance_norm_pallas(x, g, b, 1e-3, "relu", 0.3)
        return jnp.sum(y ** 2)

    def loss_ref(x, g, b):
        return jnp.sum(_instance_norm_xla(x, g, b, 1e-3, "relu", 0.3) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, gamma, beta)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_s_chunking():
    # large spatial plane must split into VMEM-sized chunks
    assert pallas_in._pick_s_chunk(256 * 512, 128, 2) % 8 == 0
    assert (256 * 512) % pallas_in._pick_s_chunk(256 * 512, 128, 2) == 0
    assert pallas_in._pick_s_chunk(64, 128, 4) == 64
