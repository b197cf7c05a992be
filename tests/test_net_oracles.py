"""Full-network numpy oracles (VERDICT round-2 item 2).

test_tf_parity.py pins each op's TF semantics against direct-loop numpy
oracles; these tests close the remaining composition-level parity risk:
layer order, padding interactions at real shapes, additive-skip
arithmetic, the full residual chain and the mask-gated head are each
re-implemented here as a pure-numpy forward (built ONLY from the
direct-loop conv/convT oracles + numpy normalization/activations,
following the reference architectures at module.py:48-318), and the JAX
nets must match to ~1e-4 on randomized parameters.

Because every affine/norm parameter is randomized (not left at init),
a wrong gamma/beta/moving-stat wiring cannot cancel out.

Shapes are small (16-32 px) so the O(HWk²CiCo) python loops stay fast,
but every structural element runs: all 9 resnet blocks, all 8+8 unet
stages, the pix2pix zip-truncated decoder, the discriminator VALID chain.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sggan_tpu.models import (discriminator, discriminator_pix2pix,
                              generator_pix2pix, generator_resnet,
                              generator_unet)
from tests.test_tf_parity import np_conv2d, np_conv2d_transpose_same

# --------------------------------------------------------- numpy layers


def np_bias(y, p):
    return y + np.asarray(p["b"], np.float64) if "b" in p else y


def np_conv(p, x, stride, padding):
    return np_bias(np_conv2d(x, np.asarray(p["w"], np.float64), stride,
                             padding), p)


def np_convT(p, x, stride):
    return np_bias(np_conv2d_transpose_same(
        x, np.asarray(p["w"], np.float64), stride), p)


def np_in(p, x, act=None, eps=1e-3):
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    y = (x - mean) / np.sqrt(var + eps)
    y = y * np.asarray(p["gamma"], np.float64) \
        + np.asarray(p["beta"], np.float64)
    if act == "relu":
        return np.maximum(y, 0)
    if act == "leaky_relu":
        return np_lrelu(y)
    return y


def np_bn_infer(p, s, x, eps=1e-3):
    mean = np.asarray(s["moving_mean"], np.float64)
    var = np.asarray(s["moving_var"], np.float64)
    return (x - mean) / np.sqrt(var + eps) \
        * np.asarray(p["gamma"], np.float64) \
        + np.asarray(p["beta"], np.float64)


def np_lrelu(x, alpha=0.3):
    return np.where(x >= 0, x, alpha * x)


def np_reflect_pad(x, p):
    return np.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


def _randomize(params, seed):
    """Replace every leaf with fresh random values (same shapes) so no
    init symmetry (gamma=1, beta=0, moving_var=1) can mask a wiring bug."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(seed)
    new = [jnp.asarray(rng.normal(0.5, 0.6, np.shape(l)).astype(np.float32))
           for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, new)


def _np(tree):
    return jax.tree.map(lambda a: np.asarray(a, np.float64), tree)


# ------------------------------------------------------ resnet generator


def np_generator_resnet(p, x, n_blocks=9):
    """module.py:219-269 composition: c7s1 (reflect 3) -> d128 -> d256 ->
    9x(reflect 1 + conv3 VALID + IN + relu, twice, + identity) -> u128 ->
    u64 -> reflect 3 + c7s1-out -> tanh."""
    y = np_conv(p["c1"], np_reflect_pad(x, 3), 1, "VALID")
    y = np_in(p["c1_in"], y, act="relu")
    y = np_in(p["c2_in"], np_conv(p["c2"], y, 2, "SAME"), act="relu")
    y = np_in(p["c3_in"], np_conv(p["c3"], y, 2, "SAME"), act="relu")
    for i in range(n_blocks):
        b = p[f"r{i + 1}"]
        z = np_in(b["in1"], np_conv(b["conv1"], np_reflect_pad(y, 1), 1,
                                    "VALID"), act="relu")
        z = np_in(b["in2"], np_conv(b["conv2"], np_reflect_pad(z, 1), 1,
                                    "VALID"))
        y = z + y
    y = np_in(p["d1_in"], np_convT(p["d1"], y, 2), act="relu")
    y = np_in(p["d2_in"], np_convT(p["d2"], y, 2), act="relu")
    y = np_conv(p["out"], np_reflect_pad(y, 3), 1, "VALID")
    return np.tanh(y)


def test_generator_resnet_matches_composed_oracle():
    ngf = 8
    params = _randomize(generator_resnet.init(jax.random.PRNGKey(0),
                                              ngf=ngf), 10)
    rng = np.random.default_rng(11)
    x = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    got = np.asarray(generator_resnet.apply(params, jnp.asarray(x),
                                            compute_dtype=jnp.float32))
    want = np_generator_resnet(_np(params), x.astype(np.float64))
    assert got.shape == want.shape == (2, 16, 16, 3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# -------------------------------------------------------- unet generator


def np_generator_unet(p, x):
    """module.py:125-206 composition: 8 stride-1 conv+IN+LeakyReLU encoder
    stages (relu on e8), 7 convT+IN decoder stages with ADDITIVE skips
    (relu only after the d3/d7 adds), convT head, tanh."""
    enc = []
    y = x
    for i in range(1, 9):
        y = np_conv(p[f"e{i}"], y, 1, "SAME")
        y = np_in(p[f"e{i}_in"], y, act="relu" if i == 8 else "leaky_relu")
        enc.append(y)
    for i in range(1, 8):
        y = np_convT(p[f"d{i}"], y, 1)
        y = np_in(p[f"d{i}_in"], y)
        y = y + enc[7 - i]
        if i in (3, 7):
            y = np.maximum(y, 0)
    y = np_convT(p["d8"], y, 1)
    return np.tanh(y)


def test_generator_unet_matches_composed_oracle():
    params = _randomize(generator_unet.init(jax.random.PRNGKey(1), ngf=4), 20)
    rng = np.random.default_rng(21)
    x = rng.uniform(-1, 1, (2, 12, 10, 3)).astype(np.float32)
    got = np.asarray(generator_unet.apply(params, jnp.asarray(x),
                                          compute_dtype=jnp.float32))
    want = np_generator_unet(_np(params), x.astype(np.float64))
    assert got.shape == want.shape == (2, 12, 10, 3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ----------------------------------------------------- pix2pix generator


def np_generator_pix2pix(p, s, x, ngf):
    """module.py:48-95 composition incl. the zip-truncated 7th upsample:
    n_down stride-2 conv blocks (BN except first), n_down-1 convT blocks
    with CONCAT skips, convT head, tanh.  BN in inference mode (the
    reference never passes training=True)."""
    import math
    n_down = int(math.log2(x.shape[1]))
    skips = []
    y = x
    for i in range(n_down):
        y = np_conv(p[f"down{i}"], y, 2, "SAME")
        if i > 0:
            y = np_bn_infer(p[f"down{i}_bn"], s[f"down{i}_bn"], y)
        y = np_lrelu(y)
        skips.append(y)
    skips = list(reversed(skips[:-1]))
    for i in range(n_down - 1):
        y = np_convT(p[f"up{i}"], y, 2)
        y = np_bn_infer(p[f"up{i}_bn"], s[f"up{i}_bn"], y)
        y = np.maximum(y, 0)
        y = np.concatenate([y, skips[i]], axis=-1)
    y = np_convT(p["last"], y, 2)
    return np.tanh(y)


def test_generator_pix2pix_matches_composed_oracle():
    ngf = 4
    params, state = generator_pix2pix.init(jax.random.PRNGKey(2), ngf=ngf,
                                           image_size=16)
    params = _randomize(params, 30)
    # randomize moving stats too (keep var positive)
    state = jax.tree.map(lambda a: jnp.abs(
        jnp.asarray(np.random.default_rng(31)
                    .normal(1.0, 0.2, a.shape).astype(np.float32))) + 0.1,
        state)
    rng = np.random.default_rng(32)
    x = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    got, _ = generator_pix2pix.apply(params, state, jnp.asarray(x),
                                     compute_dtype=jnp.float32, ngf=ngf)
    want = np_generator_pix2pix(_np(params), _np(state),
                                x.astype(np.float64), ngf)
    assert np.asarray(got).shape == want.shape == (2, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


# ------------------------------------------- semantic (SG-GAN) discriminator


def np_discriminator(p, x, mask):
    """module.py:272-318 composition: 3 stride-2 SAME convs (+IN from h1),
    h3 stride-1, the VALID stride-2 chain while the plane is > 3, conv
    n_class SAME, broadcast-multiply with the one-hot mask, reduce_sum."""
    y = np_lrelu(np_conv(p["h0"], x, 2, "SAME"))
    y = np_in(p["h1_in"], np_conv(p["h1"], y, 2, "SAME"), act="leaky_relu")
    y = np_in(p["h2_in"], np_conv(p["h2"], y, 2, "SAME"), act="leaky_relu")
    y = np_in(p["h3_in"], np_conv(p["h3"], y, 1, "SAME"), act="leaky_relu")
    i = 0
    while min(y.shape[1], y.shape[2]) > 3:
        y = np_in(p[f"v{i}_in"], np_conv(p[f"v{i}"], y, 2, "VALID"),
                  act="leaky_relu")
        i += 1
    if min(y.shape[1], y.shape[2]) >= 3:
        y = np_in(p[f"v{i}_in"], np_conv(p[f"v{i}"], y, 1, "VALID"),
                  act="leaky_relu")
    y = np_conv(p["h4"], y, 1, "SAME")
    if y.shape[1:3] != mask.shape[1:3] and y.shape[1:3] != (1, 1):
        # the rationalized broadcast (discriminator.py:92-95): collapse a
        # non-1x1 score map to a global class score before gating
        y = y.mean(axis=(1, 2), keepdims=True)
    gated = y * mask  # broadcast score map against the mask grid
    return gated.sum(axis=-1, keepdims=True)


@pytest.mark.parametrize("hw", [(32, 32), (128, 64)])
def test_discriminator_matches_composed_oracle(hw):
    """(128,64) exercises a 2-conv VALID chain (16x8 -> 7x3 -> s1 -> 5x1)
    plus the rationalized non-1x1 broadcast (spatial mean before gating);
    (32,32) the single-conv chain ending exactly at 1x1."""
    n_class = 8
    params = _randomize(discriminator.init(jax.random.PRNGKey(3), ndf=8,
                                           n_class=n_class, image_size=hw),
                        40)
    rng = np.random.default_rng(41)
    x = rng.uniform(-1, 1, (2, *hw, 3)).astype(np.float32)
    hm, wm = hw[0] // 8, hw[1] // 8
    mask = np.eye(n_class, dtype=np.float32)[
        rng.integers(0, n_class, (2, hm, wm))]
    got = discriminator.apply(params, jnp.asarray(x), jnp.asarray(mask),
                              compute_dtype=jnp.float32)
    want = np_discriminator(_np(params), x.astype(np.float64),
                            mask.astype(np.float64))
    assert np.asarray(got).shape == want.shape == (2, hm, wm, 1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------- pix2pix discriminator


def np_discriminator_pix2pix(p, s, inp, tar):
    """module.py:97-123 composition: concat -> 3 downsample blocks ->
    zero-pad + conv4 VALID 512 + BN + LeakyReLU -> zero-pad + conv4 VALID 1."""
    y = np.concatenate([inp, tar], axis=-1)
    for i in range(3):
        y = np_conv(p[f"down{i}"], y, 2, "SAME")
        if i > 0:
            y = np_bn_infer(p[f"down{i}_bn"], s[f"down{i}_bn"], y)
        y = np_lrelu(y)
    zp = lambda t: np.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = np_lrelu(np_bn_infer(p["conv_bn"], s["conv_bn"],
                             np_conv(p["conv"], zp(y), 1, "VALID")))
    return np_conv(p["last"], zp(y), 1, "VALID")


def test_discriminator_pix2pix_matches_composed_oracle():
    params, state = discriminator_pix2pix.init(jax.random.PRNGKey(4), ndf=8)
    params = _randomize(params, 50)
    state = jax.tree.map(lambda a: jnp.abs(
        jnp.asarray(np.random.default_rng(51)
                    .normal(1.0, 0.2, a.shape).astype(np.float32))) + 0.1,
        state)
    rng = np.random.default_rng(52)
    inp = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    tar = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    got, _ = discriminator_pix2pix.apply(params, state, jnp.asarray(inp),
                                         jnp.asarray(tar),
                                         compute_dtype=jnp.float32)
    want = np_discriminator_pix2pix(_np(params), _np(state),
                                    inp.astype(np.float64),
                                    tar.astype(np.float64))
    assert np.asarray(got).shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
