"""Trainer integration for the 2-D sharded step (--mesh_space) and the
dense-CRF eval refinement (--eval_crf)."""

import os

import numpy as np
import pytest
from PIL import Image

from sggan_tpu.config import Config
from sggan_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds") / "m"
    rng = np.random.default_rng(3)
    for split, n in [("trainA", 4), ("testA", 1)]:
        for sub in ["", "_seg", "_seg_class"]:
            os.makedirs(root / f"{split}{sub}", exist_ok=True)
        for i in range(n):
            name = f"t{i}.png"
            Image.fromarray(rng.integers(0, 255, (32, 32, 3), np.uint8)
                            ).save(root / split / name)
            Image.fromarray(rng.integers(0, 255, (32, 32, 3), np.uint8)
                            ).save(root / f"{split}_seg" / name)
            Image.fromarray(rng.integers(0, 8, (32, 32), np.uint8),
                            mode="L").save(root / f"{split}_seg_class" / name)
    return str(root)


def base_cfg(ds, tmp_path, **kw):
    d = dict(dataset_dir=ds, epoch=1, batch_size=2, image_height=32,
             image_width=32, ngf=4, ndf=4, segment_class=8,
             compute_dtype="float32", max_size=2, save_freq=0,
             print_freq=100, use_augmentation=True,
             checkpoint_dir=str(tmp_path / "ckpt"),
             sample_dir=str(tmp_path / "sample"),
             test_dir=str(tmp_path / "test"),
             log_dir=str(tmp_path / "logs"))
    d.update(kw)
    return Config(**d)


def test_trainer_mesh_space(ds, tmp_path):
    cfg = base_cfg(ds, tmp_path, loss_mode="sggan", use_resnet=True,
                   mesh_data=2, mesh_space=2)
    t = Trainer(cfg)
    assert t.mesh.devices.shape == (2, 2)
    res = t.train()
    assert np.isfinite(res["gen_loss"])
    assert os.listdir(cfg.test_dir)  # eval still works on sharded state


def test_trainer_mesh_space_requires_resnet(ds, tmp_path):
    cfg = base_cfg(ds, tmp_path, mesh_space=2)  # p2p unet
    with pytest.raises(NotImplementedError):
        Trainer(cfg)


def test_eval_crf(ds, tmp_path):
    pytest.importorskip("ctypes")
    from sggan_tpu.metrics import crf
    if crf._load_native() is None:
        pytest.skip("native CRF unavailable")
    cfg = base_cfg(ds, tmp_path, eval_crf=True)
    t = Trainer(cfg)
    _, score = t.test_during_train(0)
    assert 0.0 <= score["Overall Acc"] <= 1.0


def test_fused_device_step_matches_host_path(ds, tmp_path):
    """The single-dispatch fused (gather+preprocess+step) path over the
    HBM-resident split must train identically to the host iterator path
    (same seed, same keys, same flag layout)."""
    losses = {}
    for name, mb in (("fused", 2048), ("host", 0)):
        cfg = base_cfg(ds, tmp_path / name, loss_mode="sggan",
                       use_resnet=True, device_dataset_mb=mb)
        res = Trainer(cfg).train()
        losses[name] = res["gen_loss"]
    np.testing.assert_allclose(losses["fused"], losses["host"],
                               rtol=1e-4)


def test_scan_chunk_matches_per_step(ds, tmp_path):
    """--scan_steps K (K steps per lax.scan dispatch, PRNG key in the
    carry) must train equivalently to the per-step fused path: the scan
    body derives keys by the same split(key, 3) sequence, so batches,
    augmentations and dropout are identical.  Floats drift slightly
    because scan and the unrolled step are different XLA programs
    (scheduling/reassociation noise, amplified early by Adam's
    m/(sqrt(v)+eps)) — tolerances reflect that, and would still catch a
    wrong key sequence (different augmentation draws shift losses at the
    percent level)."""
    import jax

    results = {}
    for name, k in (("scan", 2), ("per_step", 1)):
        cfg = base_cfg(ds, tmp_path / name, loss_mode="sggan",
                       use_resnet=True, batch_size=1,
                       device_dataset_mb=2048, scan_steps=k)
        t = Trainer(cfg)
        res = t.train()
        results[name] = (res["gen_loss"],
                         jax.tree.map(np.asarray, t.state.gen_params))
    np.testing.assert_allclose(results["scan"][0], results["per_step"][0],
                               rtol=1e-3)
    for a, b in zip(jax.tree.leaves(results["scan"][1]),
                    jax.tree.leaves(results["per_step"][1])):
        np.testing.assert_allclose(a, b, atol=1e-2)


def test_fused_scan_on_dp_mesh_matches_host_path(ds, tmp_path):
    """VERDICT r2 item 4: the fused gather+preprocess+step dispatch (and
    its lax.scan chunking) must extend to data-parallel meshes — mesh
    training used to regress to per-step host preprocessing.  Same seed
    and key sequence on a 2-way data mesh: the scan-fused path must match
    the host-iterator dp path."""
    losses = {}
    for name, kw in (("fused_scan", dict(device_dataset_mb=2048,
                                         scan_steps=2)),
                     ("host", dict(device_dataset_mb=0, scan_steps=1))):
        cfg = base_cfg(ds, tmp_path / name, loss_mode="sggan",
                       use_resnet=True, mesh_data=2, batch_size=2, **kw)
        t = Trainer(cfg)
        assert t.mesh is not None
        res = t.train()
        losses[name] = res["gen_loss"]
    np.testing.assert_allclose(losses["fused_scan"], losses["host"],
                               rtol=1e-3)


def test_fused_scan_on_spatial_mesh(ds, tmp_path):
    """The fused scan dispatch on a (data x space) mesh: finite losses
    and matching the host-path spatial trainer at the same seed."""
    losses = {}
    for name, kw in (("fused_scan", dict(device_dataset_mb=2048,
                                         scan_steps=2)),
                     ("host", dict(device_dataset_mb=0, scan_steps=1))):
        cfg = base_cfg(ds, tmp_path / f"sp_{name}", loss_mode="sggan",
                       use_resnet=True, mesh_data=2, mesh_space=2,
                       batch_size=2, **kw)
        res = Trainer(cfg).train()
        losses[name] = res["gen_loss"]
    assert np.isfinite(losses["fused_scan"])
    np.testing.assert_allclose(losses["fused_scan"], losses["host"],
                               rtol=1e-3)


def test_gen_ema(ds, tmp_path):
    """--gen_ema: the EMA shadow trains alongside the raw generator,
    eval reads the shadow, and the checkpoint round-trips it.  Sanity:
    with decay d the shadow must sit strictly between init and the raw
    params after a few steps."""
    import jax
    from sggan_tpu.utils import checkpoint as ckpt

    cfg = base_cfg(ds, tmp_path, loss_mode="sggan", use_resnet=True,
                   gen_ema=0.9, device_dataset_mb=2048, scan_steps=2)
    t = Trainer(cfg)
    init_l = [np.asarray(l).copy() for l in jax.tree.leaves(t.state.ema)]
    res = t.train()
    assert np.isfinite(res["gen_loss"])
    ema_l = [np.asarray(l) for l in jax.tree.leaves(t.state.ema)]
    raw_l = [np.asarray(l) for l in jax.tree.leaves(t.state.gen_params)]
    # some leaves are dead biases (exactly 0 in both); the kernels must
    # show the shadow lagging the raw params but moving off init
    assert any(not np.allclose(e, r) for e, r in zip(ema_l, raw_l))
    assert any(not np.allclose(e, i) for e, i in zip(ema_l, init_l))
    restored = ckpt.load(t.state, cfg.checkpoint_dir, cfg.dataset_dir)
    assert restored is not None and restored.ema is not None
    for a, b in zip(jax.tree.leaves(restored.ema), ema_l):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-6)


def test_gen_ema_dp_mesh(ds, tmp_path):
    """EMA under the dp mesh: the shadow updates after the pmean'd Adam
    step, so it stays replica-identical and training runs."""
    cfg = base_cfg(ds, tmp_path, loss_mode="sggan", use_resnet=True,
                   gen_ema=0.9, mesh_data=2, batch_size=2)
    res = Trainer(cfg).train()
    assert np.isfinite(res["gen_loss"])


def test_scan_chunk_remainder(ds, tmp_path):
    """nb % scan_steps != 0: the epoch tail runs through the single-step
    fused program; losses stay finite and every step is counted."""
    cfg = base_cfg(ds, tmp_path, loss_mode="sggan", use_resnet=True,
                   batch_size=1, device_dataset_mb=2048, scan_steps=3)
    res = Trainer(cfg).train()  # nb=4 -> chunk of 3 + remainder of 1
    assert np.isfinite(res["gen_loss"])


def test_profile_dir_and_throughput_scalar(ds, tmp_path):
    """--profile_dir produces a jax.profiler trace for a short dispatch
    window, and every epoch logs an Images/sec scalar (StepTimer)."""
    import glob

    from sggan_tpu.utils.summary import read_scalars

    prof = str(tmp_path / "prof")
    cfg = base_cfg(ds, tmp_path, profile_dir=prof)
    res = Trainer(cfg).train()
    assert np.isfinite(res["gen_loss"])
    traces = glob.glob(os.path.join(prof, "**", "*.trace.json.gz"),
                       recursive=True)
    assert traces, "no profiler trace written"
    run = os.path.join(cfg.log_dir, os.listdir(cfg.log_dir)[0], "train")
    events = [os.path.join(run, f) for f in os.listdir(run)
              if "tfevents" in f]
    scalars = read_scalars(events[0])
    assert "Images/sec" in scalars and scalars["Images/sec"][0][1] > 0


def test_scan_compile_oom_falls_back_to_per_step(ds, tmp_path):
    """If the K-step scan program fails to COMPILE (HBM overflow through
    the remote compile service), the trainer must degrade to the
    per-step fused program — numerically identical, same PRNG sequence —
    instead of dying (the scan only amortizes dispatch latency)."""

    class OomScanTrainer(Trainer):
        def _make_fused_scan(self, ds_, k):
            def boom(*a, **kw):
                raise RuntimeError(
                    "RESOURCE_EXHAUSTED: Ran out of memory in memory "
                    "space hbm. Used 15.75G of 15.75G hbm.")
            return boom

    losses = {}
    for name, cls, k in (("oom_scan", OomScanTrainer, 3),
                         ("per_step", Trainer, 1)):
        cfg = base_cfg(ds, tmp_path / name, loss_mode="sggan",
                       use_resnet=True, batch_size=1,
                       device_dataset_mb=2048, scan_steps=k)
        t = cls(cfg)
        res = t.train()
        assert getattr(t, "_scan_disabled", False) == (k > 1)
        losses[name] = res["gen_loss"]
    np.testing.assert_allclose(losses["oom_scan"], losses["per_step"],
                               rtol=1e-4)


def test_scan_non_memory_error_reraises(ds, tmp_path):
    """Unrelated failures in the scan program must NOT be swallowed by
    the HBM fallback."""

    class BrokenScanTrainer(Trainer):
        def _make_fused_scan(self, ds_, k):
            def boom(*a, **kw):
                raise RuntimeError("something unrelated went wrong")
            return boom

    cfg = base_cfg(ds, tmp_path, loss_mode="sggan", use_resnet=True,
                   batch_size=1, device_dataset_mb=2048, scan_steps=2)
    with pytest.raises(RuntimeError, match="unrelated"):
        BrokenScanTrainer(cfg).train()


def test_gen_ema_spatial_mesh(ds, tmp_path):
    """EMA on a (data x space) mesh: the shadow rides the shard_mapped
    state (replicated spec), updates after the pmean'd Adam step, and
    eval reads it."""
    import jax

    cfg = base_cfg(ds, tmp_path, loss_mode="sggan", use_resnet=True,
                   gen_ema=0.9, mesh_data=2, mesh_space=2, batch_size=2)
    t = Trainer(cfg)
    res = t.train()
    assert np.isfinite(res["gen_loss"])
    ema_l = [np.asarray(l) for l in jax.tree.leaves(t.state.ema)]
    raw_l = [np.asarray(l) for l in jax.tree.leaves(t.state.gen_params)]
    assert any(not np.allclose(e, r) for e, r in zip(ema_l, raw_l))


def test_eval_freq(ds, tmp_path):
    """--eval_freq N: epoch-end eval runs every Nth epoch plus the final
    one; the eval scalars land only for those epochs."""
    from sggan_tpu.utils.summary import read_scalars

    cfg = base_cfg(ds, tmp_path, epoch=4, eval_freq=3)
    res = Trainer(cfg).train()
    assert res["score"] is not None  # final epoch always evals
    run = os.path.join(cfg.log_dir, os.listdir(cfg.log_dir)[0], "train")
    events = [os.path.join(run, f) for f in os.listdir(run)
              if "tfevents" in f]
    scalars = read_scalars(events[0])
    steps = sorted(s for s, _ in scalars["Mean IoU"])
    assert steps == [0, 3]  # epochs 0 (freq) and 3 (final)


def test_generate_device_fast_path_on_mesh(ds, tmp_path):
    """VERDICT r3 item 7: under a dp mesh, generate() accepts a committed
    single-device input (the fused preprocess_test output) directly —
    re-placed replicated over the mesh, no f32 host round trip — and the
    on-device u8 pull equals the host-path result exactly."""
    import jax
    import jax.numpy as jnp

    cfg = base_cfg(ds, tmp_path, loss_mode="sggan", use_resnet=True,
                   mesh_data=2, batch_size=2)
    t = Trainer(cfg)
    x_dev = jnp.asarray(
        np.random.default_rng(0).random((2, 32, 32, 3), np.float32))
    x_dev = jax.device_put(x_dev, jax.devices()[0])  # committed
    got = t.generate(x_dev, as_u8=True)
    want = t.generate(np.asarray(x_dev), as_u8=True)
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


def test_generate_device_fast_path_on_spatial_mesh(ds, tmp_path):
    cfg = base_cfg(ds, tmp_path, loss_mode="sggan", use_resnet=True,
                   mesh_data=2, mesh_space=2, batch_size=2)
    t = Trainer(cfg)
    import jax
    import jax.numpy as jnp
    x_dev = jax.device_put(jnp.asarray(
        np.random.default_rng(1).random((2, 32, 32, 3), np.float32)),
        jax.devices()[0])
    got = t.generate(x_dev, as_u8=True)
    want = t.generate(np.asarray(x_dev), as_u8=True)
    np.testing.assert_array_equal(got, want)


def test_eval_sharpen_generate(ds, tmp_path):
    """--eval_sharpen T: generate() remaps outputs tanh(T*atanh(y));
    T=1 is a no-op (default path untouched), T=inf the sign limit
    (QUALITY.md frontier knob, evaluate.sharpen)."""
    cfg = base_cfg(ds, tmp_path, loss_mode="sggan", use_resnet=True)
    t = Trainer(cfg)
    x = np.random.default_rng(0).random((1, 32, 32, 3)).astype(np.float32)
    base = t.generate(x)
    try:
        t.cfg = cfg.replace(eval_sharpen=4.0).validate()
        got = t.generate(x)
        safe = np.clip(base, -1 + 1e-6, 1 - 1e-6)
        np.testing.assert_allclose(got, np.tanh(4.0 * np.arctanh(safe)),
                                   atol=1e-5)
        assert not np.allclose(got, base)  # the knob does something
        t.cfg = cfg.replace(eval_sharpen=float("inf")).validate()
        np.testing.assert_array_equal(t.generate(x), np.sign(base))
        # u8 pull composes with sharpening (eval/test/sample path)
        u8 = t.generate(x, as_u8=True)
        assert u8.dtype == np.uint8 and set(np.unique(u8)) <= {0, 255}
    finally:
        t.cfg = cfg
