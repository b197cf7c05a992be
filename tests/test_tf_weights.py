"""TF-weight import tests: the flat Keras get_weights() order must map
exactly onto our param trees, and imported weights must drive the forward
pass."""

import io

import jax
import jax.numpy as jnp
import numpy as np

from sggan_tpu.models import discriminator, generator_resnet, generator_unet
from sggan_tpu.utils import tf_weights


def _flat_like(params, layout):
    """Build a synthetic flat weight list matching the layout's shapes."""
    rng = np.random.default_rng(0)
    flat = []
    for path, _ in layout:
        node = params
        for p in path.split("/")[:-1]:
            node = node[p]
        shape = node[path.split("/")[-1]].shape
        flat.append(rng.normal(size=shape).astype(np.float32))
    return flat


def test_resnet_roundtrip():
    params = generator_resnet.init(jax.random.PRNGKey(0), ngf=8)
    layout = tf_weights.resnet_layout()
    flat = _flat_like(params, layout)
    new = tf_weights.assign_flat_weights(flat, "resnet", params)
    # spot-check first conv kernel and a deep IN gamma
    np.testing.assert_array_equal(np.asarray(new["c1"]["w"]), flat[0])
    np.testing.assert_array_equal(np.asarray(new["r5"]["in2"]["beta"]),
                                  flat[layout.index(("r5/in2/beta",
                                                     "beta"))])
    # forward still runs with imported weights
    y = generator_resnet.apply(new, jnp.zeros((1, 32, 32, 3)))
    assert y.shape == (1, 32, 32, 3)


def test_unet_and_disc_layout_lengths():
    p_unet = generator_unet.init(jax.random.PRNGKey(0), ngf=4)
    lay_u = tf_weights.unet_layout()
    flat = _flat_like(p_unet, lay_u)
    new = tf_weights.assign_flat_weights(flat, "unet", p_unet)
    np.testing.assert_array_equal(np.asarray(new["e1"]["w"]), flat[0])

    p_d = discriminator.init(jax.random.PRNGKey(1), ndf=4, n_class=8,
                             image_size=(128, 128))
    lay_d = tf_weights.discriminator_layout()
    flat_d = _flat_like(p_d, lay_d)
    new_d = tf_weights.assign_flat_weights(flat_d, "discriminator", p_d)
    np.testing.assert_array_equal(np.asarray(new_d["h4"]["b"]), flat_d[-1])


def test_npz_roundtrip(tmp_path):
    params = generator_resnet.init(jax.random.PRNGKey(0), ngf=8)
    flat = _flat_like(params, tf_weights.resnet_layout())
    f = tmp_path / "gen.npz"
    np.savez(f, **{f"w{i}": w for i, w in enumerate(flat)})
    new = tf_weights.load_npz_weights(str(f), "resnet", params)
    np.testing.assert_array_equal(np.asarray(new["out"]["w"]), flat[-2])


def test_shape_mismatch_raises():
    params = generator_resnet.init(jax.random.PRNGKey(0), ngf=8)
    flat = _flat_like(params, tf_weights.resnet_layout())
    flat[0] = flat[0][..., :1]
    import pytest
    with pytest.raises(ValueError):
        tf_weights.assign_flat_weights(flat, "resnet", params)


def test_import_tf_cli_roundtrip(tmp_path):
    """The migration CLI (python -m sggan_tpu.utils.import_tf): an npz of
    Keras-ordered generator+discriminator weights lands in an orbax
    checkpoint that Trainer loads, with the imported values intact."""
    from sggan_tpu.config import Config
    from sggan_tpu.train.step import init_state
    from sggan_tpu.utils import checkpoint as ckpt
    from sggan_tpu.utils import import_tf

    cfg = Config(dataset_dir="city", checkpoint_dir=str(tmp_path / "ckpt"),
                 use_resnet=True, ngf=8, ndf=4, segment_class=8,
                 image_height=128, image_width=128,
                 compute_dtype="float32").validate()
    params = generator_resnet.init(jax.random.PRNGKey(0), ngf=8)
    flat = _flat_like(params, tf_weights.resnet_layout())
    gen_npz = tmp_path / "gen.npz"
    np.savez(gen_npz, **{f"w{i}": w for i, w in enumerate(flat)})

    disc_p = discriminator.init(jax.random.PRNGKey(1), ndf=4, n_class=8,
                                image_size=(128, 128))
    lay_d = tf_weights.discriminator_layout(
        n_valid=len([k for k in disc_p if k.startswith("v")
                     and not k.endswith("_in")]))
    flat_d = _flat_like(disc_p, lay_d)
    disc_npz = tmp_path / "disc.npz"
    np.savez(disc_npz, **{f"w{i}": w for i, w in enumerate(flat_d)})

    import_tf.import_checkpoint(cfg, str(gen_npz), str(disc_npz),
                                epoch_tag=7)
    template = init_state(cfg, jax.random.PRNGKey(9))
    restored = ckpt.load(template, cfg.checkpoint_dir, cfg.dataset_dir)
    assert restored is not None
    np.testing.assert_array_equal(
        np.asarray(restored.gen_params["c1"]["w"]), flat[0])
    np.testing.assert_array_equal(
        np.asarray(restored.disc_params["h4"]["b"]), flat_d[-1])
    y = generator_resnet.apply(restored.gen_params,
                               jnp.zeros((1, 32, 32, 3)))
    assert y.shape == (1, 32, 32, 3)


def test_import_tf_pix2pix_with_bn_stats(tmp_path):
    """pix2pix import: Keras BN layers interleave [gamma, beta,
    moving_mean, moving_var] in the flat order; the layout must route
    stats into the functional BN-state tree and params into the param
    tree, for generator AND discriminator."""
    from sggan_tpu.config import Config
    from sggan_tpu.models import discriminator_pix2pix, generator_pix2pix
    from sggan_tpu.train.step import init_state
    from sggan_tpu.utils import checkpoint as ckpt
    from sggan_tpu.utils import import_tf

    cfg = Config(dataset_dir="city", checkpoint_dir=str(tmp_path / "ckpt"),
                 use_pix2pix=True, ngf=4, ndf=4, segment_class=8,
                 image_height=64, image_width=64,
                 compute_dtype="float32").validate()
    gp, gbn = generator_pix2pix.init(jax.random.PRNGKey(0), ngf=4,
                                     image_size=64)
    layout = tf_weights.pix2pix_gen_layout(64)
    rng = np.random.default_rng(1)
    flat = []
    for tree, path in layout:
        node = gp if tree == "p" else gbn
        for q in path.split("/")[:-1]:
            node = node[q]
        flat.append(rng.normal(size=node[path.split("/")[-1]].shape)
                    .astype(np.float32))
    gen_npz = tmp_path / "gen.npz"
    np.savez(gen_npz, **{f"w{i}": w for i, w in enumerate(flat)})

    dp, dbn = discriminator_pix2pix.init(jax.random.PRNGKey(1), ndf=4)
    lay_d = tf_weights.pix2pix_disc_layout()
    flat_d = []
    for tree, path in lay_d:
        node = dp if tree == "p" else dbn
        for q in path.split("/")[:-1]:
            node = node[q]
        flat_d.append(rng.normal(size=node[path.split("/")[-1]].shape)
                      .astype(np.float32))
    disc_npz = tmp_path / "disc.npz"
    np.savez(disc_npz, **{f"w{i}": w for i, w in enumerate(flat_d)})

    import_tf.import_checkpoint(cfg, str(gen_npz), str(disc_npz),
                                epoch_tag=3)
    template = init_state(cfg, jax.random.PRNGKey(9))
    restored = ckpt.load(template, cfg.checkpoint_dir, cfg.dataset_dir)
    assert restored is not None
    # params and BN stats both carry imported values
    np.testing.assert_array_equal(
        np.asarray(restored.gen_params["down0"]["w"]), flat[0])
    mm_idx = layout.index(("s", "down1_bn/moving_mean"))
    np.testing.assert_array_equal(
        np.asarray(restored.gen_bn["down1_bn"]["moving_mean"]),
        flat[mm_idx])
    np.testing.assert_array_equal(
        np.asarray(restored.disc_params["last"]["b"]), flat_d[-1])
    np.testing.assert_array_equal(
        np.asarray(restored.disc_bn["conv_bn"]["moving_var"]),
        flat_d[lay_d.index(("s", "conv_bn/moving_var"))])
    # forward runs with imported weights + stats
    y, _ = generator_pix2pix.apply(restored.gen_params, restored.gen_bn,
                                   jnp.zeros((1, 64, 64, 3)), ngf=4)
    assert y.shape == (1, 64, 64, 3)
