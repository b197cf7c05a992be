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
