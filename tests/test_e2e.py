"""End-to-end tests: full train epoch -> eval -> checkpoint -> resume ->
test-phase inference over a synthetic on-disk dataset, exercising the same
surface as `python main.py --phase train/test`."""

import os

import numpy as np
import pytest
from PIL import Image

from sggan_tpu.config import Config
from sggan_tpu.train.trainer import Trainer
from sggan_tpu.utils import checkpoint as ckpt


@pytest.fixture(scope="module")
def ds_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("datasets") / "e2e"
    rng = np.random.default_rng(7)
    for split, n in [("trainA", 4), ("testA", 2)]:
        for sub in ["", "_seg", "_seg_class"]:
            os.makedirs(root / f"{split}{sub}", exist_ok=True)
        for i in range(n):
            name = f"f{i:02d}.png"
            Image.fromarray(rng.integers(0, 255, (48, 64, 3), np.uint8)
                            ).save(root / split / name)
            Image.fromarray(rng.integers(0, 255, (48, 64, 4), np.uint8)
                            ).save(root / f"{split}_seg" / name)
            Image.fromarray(rng.integers(0, 8, (48, 64), np.uint8),
                            mode="L").save(root / f"{split}_seg_class" / name)
    return str(root)


def make_cfg(ds_root, tmp_path, **kw):
    base = dict(dataset_dir=ds_root, epoch=1, batch_size=2,
                image_height=32, image_width=32, ngf=4, ndf=4,
                segment_class=8, compute_dtype="float32", max_size=2,
                save_freq=0, print_freq=100,
                checkpoint_dir=str(tmp_path / "ckpt"),
                sample_dir=str(tmp_path / "sample"),
                test_dir=str(tmp_path / "test"),
                log_dir=str(tmp_path / "logs"))
    base.update(kw)
    return Config(**base)


def test_train_eval_checkpoint_resume(ds_root, tmp_path):
    cfg = make_cfg(ds_root, tmp_path)
    t = Trainer(cfg)
    result = t.train()
    assert result["epoch"] == 0
    assert np.isfinite(result["gen_loss"])
    score = result["score"]
    assert 0.0 <= score["Overall Acc"] <= 1.0

    # eval wrote one fake PNG per test file at training resolution
    fakes = sorted(os.listdir(cfg.test_dir))
    assert fakes == ["f00.png", "f01.png"]
    img = np.asarray(Image.open(os.path.join(cfg.test_dir, "f00.png")))
    assert img.shape == (32, 32, 3)

    # tfevents written
    runs = os.listdir(cfg.log_dir)
    assert len(runs) == 1
    events = os.listdir(os.path.join(cfg.log_dir, runs[0], "train"))
    assert any(e.startswith("events.out.tfevents") for e in events)

    # checkpoint exists and restores including optimizer state + step
    assert ckpt.latest_epoch(cfg.checkpoint_dir, cfg.dataset_dir) == 0
    t2 = Trainer(cfg.replace(continue_train=True))
    restored = ckpt.load(t2.state, cfg.checkpoint_dir, cfg.dataset_dir)
    assert restored is not None
    assert int(restored.step) == int(t.state.step) > 0
    np.testing.assert_allclose(
        np.asarray(jax_leaf(restored.gen_params)),
        np.asarray(jax_leaf(t.state.gen_params)))

    # resumed training continues from the restored step
    t2.state = restored
    t2.train()
    assert int(t2.state.step) > int(t.state.step)


def jax_leaf(tree):
    import jax
    return jax.tree_util.tree_leaves(tree)[0]


def test_phase_test_writes_pairs(ds_root, tmp_path):
    cfg = make_cfg(ds_root, tmp_path, phase="test")
    t = Trainer(cfg)
    t.test()  # no checkpoint -> load fails but inference still runs
    names = sorted(os.listdir(cfg.test_dir))
    assert names == ["f00.png", "f01.png", "real_f00.png", "real_f01.png"]


def test_sample_model(ds_root, tmp_path):
    cfg = make_cfg(ds_root, tmp_path)
    t = Trainer(cfg)
    t.sample_model(epoch=0, idx=3)
    files = os.listdir(cfg.sample_dir)
    assert len(files) == 1 and files[0].startswith("A_00_0003_")


def test_cli_parity_flags():
    """The CLI accepts the reference's exact flag spelling."""
    from sggan_tpu.config import parse_args
    cfg = parse_args(["--dataset_dir", "city", "--epoch", "3",
                      "--img_height", "128", "--img_width", "128",
                      "--use_resnet", "--phase", "test", "--lr", "1e-4"])
    assert cfg.epoch == 3 and cfg.use_resnet and cfg.phase == "test"
    assert cfg.image_height == 128 and cfg.lr == 1e-4
