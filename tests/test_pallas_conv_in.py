"""Numerics oracle for the fused Pallas conv3x3+IN(+act) kernel
(ops/pallas_conv_in.py) against the default XLA composition
(conv2d_reflect -> instance_norm), forward and gradients.

Same REAL function, different tap-summation order — so equality is
bounded at a few ulps of the compute dtype rather than bitwise
(the kernel docstring states this contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sggan_tpu.ops import pallas_conv_in as pci
from sggan_tpu.ops.norm import instance_norm_init


def _setup(n, h, w, cin, cout, dtype, seed=0):
    k = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    x = jax.random.normal(k1, (n, h, w, cin), dtype)
    wk = (jax.random.normal(k2, (3, 3, cin, cout), jnp.float32)
          * (1.0 / np.sqrt(9 * cin)))
    inp = instance_norm_init(cout)
    inp["gamma"] = 1.0 + 0.1 * jax.random.normal(k3, (cout,))
    inp["beta"] = 0.1 * jax.random.normal(k4, (cout,))
    return x, wk, inp


@pytest.mark.parametrize("im2col", [False, True])
@pytest.mark.parametrize("act", [None, "relu", "leaky_relu"])
@pytest.mark.parametrize("shape", [(2, 8, 16, 8, 8), (1, 16, 8, 16, 8)])
def test_forward_matches_xla(shape, act, im2col):
    n, h, w, cin, cout = shape
    x, wk, inp = _setup(n, h, w, cin, cout, jnp.float32)
    got = pci.conv3_in(x, wk, inp["gamma"], inp["beta"], act=act,
                       interpret=True, im2col=im2col)
    want = pci.conv3_in_xla({"w": wk}, inp, x, act=act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_forward_bf16_close():
    """bf16 activations: the kernel rounds the f32 conv accumulator once
    (like XLA); outputs agree to ~1 bf16 ulp of the normalized scale."""
    x, wk, inp = _setup(2, 16, 16, 8, 8, jnp.bfloat16)
    got = pci.conv3_in(x, wk, inp["gamma"], inp["beta"], act="relu",
                       interpret=True)
    want = pci.conv3_in_xla({"w": wk}, inp, x, act="relu")
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.05)


@pytest.mark.parametrize("act", [None, "relu"])
def test_grads_match_xla(act):
    n, h, w, cin, cout = 2, 8, 8, 8, 8
    x, wk, inp = _setup(n, h, w, cin, cout, jnp.float32, seed=3)

    def loss_pallas(x, wk, g, b):
        y = pci.conv3_in(x, wk, g, b, act=act, interpret=True)
        return jnp.sum(y * y)

    def loss_xla(x, wk, g, b):
        y = pci.conv3_in_xla({"w": wk}, {"gamma": g, "beta": b}, x,
                             act=act)
        return jnp.sum(y * y)

    got = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(
        x, wk, inp["gamma"], inp["beta"])
    want = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(
        x, wk, inp["gamma"], inp["beta"])
    for g, wnt, name in zip(got, want, ("dx", "dw", "dgamma", "dbeta")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wnt), rtol=2e-4, atol=2e-4,
            err_msg=name)


def test_tall_multi_tile():
    """H spans several row tiles — exercises the DMA pipeline, the
    cross-tile moment accumulation, and the phase-B read-back."""
    x, wk, inp = _setup(1, 64, 8, 8, 16, jnp.float32, seed=5)
    got = pci.conv3_in(x, wk, inp["gamma"], inp["beta"], act="relu",
                       interpret=True)
    want = pci.conv3_in_xla({"w": wk}, inp, x, act="relu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_supported_gate():
    w8 = jnp.zeros((3, 3, 8, 8))
    assert pci.supported(jnp.zeros((1, 16, 16, 8)), w8)
    assert not pci.supported(jnp.zeros((1, 16, 16, 4)), w8)  # cin mismatch
    assert not pci.supported(jnp.zeros((1, 16, 16, 8)),
                             jnp.zeros((5, 5, 8, 8)))  # not 3x3
