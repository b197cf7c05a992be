"""Config validation + checkpoint retention tests."""

import jax
import numpy as np
import pytest

from sggan_tpu.config import Config
from sggan_tpu.train import init_state
from sggan_tpu.utils import checkpoint as ckpt


def test_validate_ok():
    Config(image_height=128, image_width=128).validate()
    Config(image_height=64, image_width=128, mesh_space=2,
           loss_mode="sggan", use_resnet=True).validate()


@pytest.mark.parametrize("kw,msg", [
    (dict(image_height=100, image_width=128), "divisible"),
    (dict(image_height=40, image_width=64, mesh_space=2,
          loss_mode="sggan", use_resnet=True), "mesh_space"),
    (dict(batch_size=3, mesh_data=4, use_augmentation=False), "mesh_data"),
    (dict(loss_mode="cycle", use_pix2pix=True), "pix2pix"),
    (dict(sggan_l1_target="segs"), "sggan_l1_target"),
    (dict(loss_mode="sgan"), "loss_mode"),
    (dict(dropout_mode="keras"), "dropout_mode"),
    (dict(compat_fake_history=True, mesh_data=2, batch_size=2),
     "compat_fake_history"),
    (dict(compat_fake_history=True, mesh_space=2, image_height=256),
     "compat_fake_history"),
    (dict(eval_sharpen=0.5), "eval_sharpen"),
    (dict(eval_sharpen=float("nan")), "eval_sharpen"),
])
def test_validate_raises(kw, msg):
    with pytest.raises(ValueError, match=msg):
        Config(**kw).validate()


def test_checkpoint_max_to_keep(tmp_path):
    cfg = Config(image_height=32, image_width=32, ngf=4, ndf=4,
                 segment_class=8, compute_dtype="float32")
    state = init_state(cfg, jax.random.PRNGKey(0))
    for ep in range(5):
        ckpt.save(state, str(tmp_path), "ds", ep)
    import os
    kept = sorted(os.listdir(tmp_path / "ds" / "gen"))
    assert kept == ["cp-0002", "cp-0003", "cp-0004"]  # max_to_keep=3
    assert ckpt.latest_epoch(str(tmp_path), "ds") == 4
    restored = ckpt.load(state, str(tmp_path), "ds")
    assert restored is not None
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.gen_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.gen_params)[0]))


def test_checkpoint_absolute_dataset_dir(tmp_path):
    """Absolute --dataset_dir must NOT redirect checkpoints into the
    dataset directory (regression: os.path.join discards the checkpoint
    root for absolute second components)."""
    cfg = Config(image_height=32, image_width=32, ngf=4, ndf=4,
                 segment_class=8, compute_dtype="float32")
    state = init_state(cfg, jax.random.PRNGKey(0))
    ds_abs = str(tmp_path / "data" / "city")
    ck = str(tmp_path / "ckpt")
    ckpt.save(state, ck, ds_abs, 0)
    import os
    assert os.path.isdir(os.path.join(ck, "city", "gen", "cp-0000"))
    assert not os.path.exists(os.path.join(ds_abs, "gen"))
    assert ckpt.latest_epoch(ck, ds_abs) == 0
    assert ckpt.load(state, ck, ds_abs) is not None


def test_eval_sharpen_cli_parses_inf():
    from sggan_tpu.config import parse_args
    cfg = parse_args(["--eval_sharpen", "inf"])
    assert np.isinf(cfg.eval_sharpen)
    assert parse_args([]).eval_sharpen == 1.0
