"""Shape + behaviour tests for the five networks and the loss criterions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sggan_tpu import losses
from sggan_tpu.models import (discriminator, discriminator_pix2pix,
                              generator_pix2pix, generator_resnet,
                              generator_unet)

KEY = jax.random.PRNGKey(0)


def test_generator_resnet_shapes():
    p = generator_resnet.init(KEY, ngf=8)
    for hw in [(64, 64), (128, 128), (64, 128)]:
        x = jnp.zeros((1, *hw, 3))
        y = generator_resnet.apply(p, x)
        assert y.shape == (1, *hw, 3)
        assert y.dtype == jnp.float32
    yn = np.asarray(generator_resnet.apply(
        p, jax.random.uniform(KEY, (1, 64, 64, 3))))
    assert (yn >= -1).all() and (yn <= 1).all()  # tanh head


def test_generator_unet_shapes_and_dropout():
    p = generator_unet.init(KEY, ngf=4)
    x = jax.random.uniform(KEY, (2, 32, 32, 3))
    y1 = generator_unet.apply(p, x, deterministic=True)
    assert y1.shape == (2, 32, 32, 3)
    # dropout changes the output when enabled, is reproducible per key
    y2 = generator_unet.apply(p, x, rng=jax.random.PRNGKey(1),
                              deterministic=False)
    y3 = generator_unet.apply(p, x, rng=jax.random.PRNGKey(1),
                              deterministic=False)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y3))


def test_generator_pix2pix_shapes():
    p, s = generator_pix2pix.init(KEY, ngf=4, image_size=32)
    x = jax.random.uniform(KEY, (1, 32, 32, 3))
    y, new_s = generator_pix2pix.apply(p, s, x, ngf=4)
    assert y.shape == (1, 32, 32, 3)
    assert set(new_s) == set(s)
    # train=True updates BN moving stats
    _, s_tr = generator_pix2pix.apply(p, s, x, ngf=4, train=True)
    moved = any(
        not np.allclose(np.asarray(s[k]["moving_mean"]),
                        np.asarray(s_tr[k]["moving_mean"]))
        for k in s)
    assert moved


def test_generator_pix2pix_channel_plan():
    """Reference decoder plan at 128x128 (module.py:51-69): up filters are
    reversed(down) zip-truncated = [512,512,512,512,256,128], and the last
    convT sees 128+64=192 input channels."""
    p, _ = generator_pix2pix.init(KEY, ngf=64, image_size=128)
    down = [p[f"down{i}"]["w"].shape[3] for i in range(7)]
    assert down == [64, 128, 256, 512, 512, 512, 512]
    # conv-transpose kernels are (kh, kw, out, in)
    up = [p[f"up{i}"]["w"].shape[2] for i in range(6)]
    assert up == [512, 512, 512, 512, 256, 128]
    assert p["last"]["w"].shape == (4, 4, 3, 192)


def test_discriminator_semantic_gating():
    """The mask gate must select exactly the class channel's score
    (module.py:311-314 semantics).

    Note a faithful-parity quirk: with the reference's "global" head the
    last VALID conv emits a 1x1 spatial map, so instance norm over the
    spatial plane degenerates to outputting beta (== 0 at init) — the
    whole discriminator scores exactly 0 at init, in our build AND in the
    TF reference.  We therefore probe the gate through the h4 bias."""
    p = discriminator.init(KEY, ndf=8, n_class=6, image_size=(128, 128))
    x = jax.random.uniform(KEY, (2, 128, 128, 3))
    mask2 = jnp.zeros((2, 16, 16, 6)).at[..., 2].set(1.0)
    out0 = discriminator.apply(p, x, mask2)
    assert out0.shape == (2, 16, 16, 1)
    np.testing.assert_allclose(np.asarray(out0), 0.0)  # the init degeneracy

    bias = jnp.arange(6, dtype=jnp.float32)
    p["h4"] = dict(p["h4"], b=bias)
    # head output == bias per class channel; gated sum selects bias[class]
    out2 = discriminator.apply(p, x, mask2)
    np.testing.assert_allclose(np.asarray(out2), 2.0, atol=1e-5)
    mask3 = jnp.zeros((2, 16, 16, 6)).at[..., 3].set(1.0)
    out3 = discriminator.apply(p, x, mask3)
    np.testing.assert_allclose(np.asarray(out3), 3.0, atol=1e-5)
    # zero mask -> zero logits (gating is multiplicative)
    out_z = discriminator.apply(p, x, jnp.zeros((2, 16, 16, 6)))
    np.testing.assert_allclose(np.asarray(out_z), 0.0)


def test_discriminator_valid_chain_128():
    # reproduces the reference's h31/h32/h33 stack: 16 -> 7 -> 3 -> 1
    assert discriminator._valid_chain(16, 16) == [2, 2, 1]


def test_discriminator_patch_head():
    p = discriminator.init(KEY, ndf=8, n_class=6, image_size=(64, 64),
                           head="patch")
    x = jax.random.uniform(KEY, (1, 64, 64, 3))
    mask = jnp.zeros((1, 8, 8, 6)).at[..., 0].set(1.0)
    out = discriminator.apply(p, x, mask, head="patch")
    assert out.shape == (1, 8, 8, 1)


def test_discriminator_pix2pix_shapes():
    p, s = discriminator_pix2pix.init(KEY, ndf=8)
    a = jax.random.uniform(KEY, (1, 128, 128, 3))
    y, _ = discriminator_pix2pix.apply(p, s, a, a)
    # 128 -> 64 -> 32 -> 16 -> pad 18 -> 15 -> pad 17 -> 14
    assert y.shape == (1, 14, 14, 1)


def test_loss_values():
    logits = jnp.array([0.0, 2.0, -2.0])
    # sigmoid CE vs labels=1: softplus(-x)
    expect = np.log1p(np.exp(-np.asarray(logits)))
    np.testing.assert_allclose(
        float(losses.sce_criterion(logits, jnp.ones_like(logits))),
        expect.mean(), rtol=1e-6)
    # LSGAN
    np.testing.assert_allclose(
        float(losses.mae_criterion(logits, jnp.ones_like(logits))),
        float(np.mean((np.asarray(logits) - 1) ** 2)), rtol=1e-6)
    # p2p gen loss = BCE + 100*L1
    fake = jnp.zeros((1, 4, 4, 3))
    seg = jnp.full((1, 4, 4, 3), 0.5)
    g = losses.gen_loss_p2p(logits, fake, seg)
    np.testing.assert_allclose(float(g), expect.mean() + 100 * 0.5, rtol=1e-5)


def test_gradloss_zero_for_identical():
    x = jax.random.uniform(KEY, (1, 8, 8, 3))
    w = jnp.ones((1, 8, 8, 1))
    assert float(losses.gradloss_criterion(x, x, w)) == 0.0
    y = jax.random.uniform(jax.random.PRNGKey(9), (1, 8, 8, 3))
    assert float(losses.gradloss_criterion(x, y, w)) > 0.0


def test_sggan_losses_finite_and_grad():
    p = discriminator.init(KEY, ndf=4, n_class=4, image_size=(64, 64),
                           head="patch")
    gp = generator_resnet.init(KEY, ngf=4)
    x = jax.random.uniform(KEY, (1, 64, 64, 3))
    seg = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
    mask = jnp.zeros((1, 8, 8, 4)).at[..., 1].set(1.0)

    def loss_fn(gp):
        fake = generator_resnet.apply(gp, x)
        da_fake = discriminator.apply(p, fake, mask, head="patch")
        return losses.gen_loss_sggan(da_fake, x, fake, seg, use_lsgan=True,
                                     l1_lambda=10.0, lg_lambda=5.0)

    val, grads = jax.value_and_grad(loss_fn)(gp)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_gen_loss_sggan_l1_target():
    """sggan_l1_target switches the L1 anchor: 'real' reproduces the
    dormant model.py:122 (L1 vs real_A), 'seg' anchors to seg_A; the
    GAN and gradient-sensitive terms are unchanged."""
    import jax
    import jax.numpy as jnp
    from sggan_tpu import losses
    k = jax.random.PRNGKey(3)
    da = jax.random.normal(k, (2, 4, 4, 1))
    real = jax.random.uniform(jax.random.fold_in(k, 1), (2, 16, 16, 3))
    fake = jax.random.uniform(jax.random.fold_in(k, 2), (2, 16, 16, 3))
    seg = jax.random.uniform(jax.random.fold_in(k, 3), (2, 16, 16, 3))
    kw = dict(use_lsgan=True, l1_lambda=10.0, lg_lambda=0.0)
    l_real = losses.gen_loss_sggan(da, real, fake, seg, l1_target="real",
                                   **kw)
    l_seg = losses.gen_loss_sggan(da, real, fake, seg, l1_target="seg",
                                  **kw)
    gan = losses.mae_criterion(da, jnp.ones_like(da))
    np.testing.assert_allclose(
        float(l_real), float(gan + 10.0 * losses.abs_criterion(real, fake)),
        rtol=1e-6)
    np.testing.assert_allclose(
        float(l_seg), float(gan + 10.0 * losses.abs_criterion(seg, fake)),
        rtol=1e-6)


def test_remat_grads_match():
    """--remat (jax.checkpoint on generator stages) must not change
    numerics: losses and gradients equal the non-remat forward."""
    import jax
    import jax.numpy as jnp
    from sggan_tpu.models import generator_resnet, generator_unet
    k = jax.random.PRNGKey(5)
    x = jax.random.uniform(jax.random.fold_in(k, 1), (1, 16, 16, 3))

    for mod, kw in ((generator_resnet, {}),
                    (generator_unet, dict(rng=jax.random.PRNGKey(7),
                                          deterministic=False))):
        p = mod.init(k, ngf=4)

        def loss(params, remat):
            return jnp.sum(jnp.square(
                mod.apply(params, x, remat=remat, **kw)))

        l0, g0 = jax.value_and_grad(lambda q: loss(q, False))(p)
        l1, g1 = jax.value_and_grad(lambda q: loss(q, True))(p)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-6)
