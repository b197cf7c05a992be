"""Observability tests: the dependency-free tfevents writer must produce
records TensorBoard can read — verified by re-parsing the TFRecord framing
(CRC32C) and the Event/Summary protobuf wire format; device-side metric
accumulation must equal the host path; the trainer runs data-parallel over
a mesh when mesh_data > 1."""

import os
import struct

import numpy as np
import pytest

from sggan_tpu.metrics.scores import fast_hist, hist_device, scores, \
    scores_from_hist
from sggan_tpu.utils import summary


# -------------------------------------------------- tfevents round-trip

def _read_records(path):
    out = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                return out
            (length,) = struct.unpack("<Q", header)
            (crc_h,) = struct.unpack("<I", f.read(4))
            assert crc_h == summary._masked_crc(header)
            payload = f.read(length)
            (crc_p,) = struct.unpack("<I", f.read(4))
            assert crc_p == summary._masked_crc(payload)
            out.append(payload)


def _parse_fields(buf):
    """Minimal proto wire parser -> {field: [values]}."""
    fields = {}
    i = 0
    while i < len(buf):
        key = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wire = key >> 3, key & 7
        if wire == 0:
            v = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wire == 1:
            v = struct.unpack("<d", buf[i:i + 8])[0]
            i += 8
        elif wire == 5:
            v = struct.unpack("<f", buf[i:i + 4])[0]
            i += 4
        elif wire == 2:
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            v = buf[i:i + ln]
            i += ln
        else:
            raise ValueError(wire)
        fields.setdefault(field, []).append(v)
    return fields


def test_summary_writer_roundtrip(tmp_path):
    w = summary.SummaryWriter(str(tmp_path))
    w.scalar("Generator Loss", 1.25, step=3)
    w.image("Fakes", np.zeros((4, 4, 3), np.uint8), step=3)
    w.close()
    files = os.listdir(tmp_path)
    assert len(files) == 1 and files[0].startswith("events.out.tfevents")
    records = _read_records(os.path.join(tmp_path, files[0]))
    assert len(records) == 3  # file_version + scalar + image

    head = _parse_fields(records[0])
    assert head[3] == [b"brain.Event:2"]

    ev = _parse_fields(records[1])
    assert ev[2] == [3]                      # step
    val = _parse_fields(_parse_fields(ev[5][0])[1][0])
    assert val[1] == [b"Generator Loss"]     # tag
    np.testing.assert_allclose(val[2], [1.25])  # simple_value

    img_ev = _parse_fields(records[2])
    img_val = _parse_fields(_parse_fields(img_ev[5][0])[1][0])
    img_msg = _parse_fields(img_val[4][0])
    assert img_msg[1] == [4] and img_msg[2] == [4]  # height, width
    assert img_msg[4][0].startswith(b"\x89PNG")


# ------------------------------------------------ device metric parity

def test_hist_device_matches_host():
    rng = np.random.default_rng(0)
    lt = rng.integers(-1, 6, (3, 17, 13))   # includes ignored labels
    lp = rng.integers(0, 6, (3, 17, 13))
    host = sum(fast_hist(a, b, 6) for a, b in zip(lt, lp))
    dev = np.asarray(hist_device(lt, lp, 6))
    np.testing.assert_array_equal(dev, host)
    s1 = scores(list(lt), list(lp), 6)
    s2 = scores_from_hist(dev)
    np.testing.assert_allclose(s1["Mean IoU"], s2["Mean IoU"])
    np.testing.assert_allclose(s1["Overall Acc"], s2["Overall Acc"])


# ------------------------------------------------ trainer on a dp mesh

def test_trainer_mesh_data(tmp_path):
    from PIL import Image
    from sggan_tpu.config import Config
    from sggan_tpu.train.trainer import Trainer

    root = tmp_path / "ds"
    rng = np.random.default_rng(5)
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

    cfg = Config(dataset_dir=str(root), epoch=1, batch_size=2,
                 image_height=32, image_width=32, ngf=4, ndf=4,
                 segment_class=8, compute_dtype="float32", max_size=2,
                 mesh_data=4, use_augmentation=True, save_freq=0,
                 print_freq=100, loss_mode="p2p",
                 dropout_mode="keras_quirk",
                 checkpoint_dir=str(tmp_path / "ckpt"),
                 sample_dir=str(tmp_path / "sample"),
                 test_dir=str(tmp_path / "test"),
                 log_dir=str(tmp_path / "logs"))
    t = Trainer(cfg)
    assert t.mesh is not None and t.mesh.devices.size == 4
    res = t.train()
    assert np.isfinite(res["gen_loss"])


def test_read_scalars_roundtrip(tmp_path):
    w = summary.SummaryWriter(str(tmp_path))
    for s in range(3):
        w.scalar("Mean IoU", 0.1 * s, s)
    w.close()
    f = os.path.join(tmp_path, os.listdir(tmp_path)[0])
    back = summary.read_scalars(f)
    assert [x[0] for x in back["Mean IoU"]] == [0, 1, 2]
    np.testing.assert_allclose([x[1] for x in back["Mean IoU"]],
                               [0.0, 0.1, 0.2], atol=1e-6)


def test_hbm_probe_plumbing(tmp_path):
    """The compile-only memory probe (utils/hbm.py): abstract-compile the
    scan/step/eval programs for a tiny config and report byte counts —
    nothing executes, no dataset is read."""
    from sggan_tpu.config import Config
    from sggan_tpu.utils.hbm import probe_memory

    cfg = Config(dataset_dir=str(tmp_path), loss_mode="sggan",
                 use_resnet=True, batch_size=2, image_height=32,
                 image_width=32, ngf=4, ndf=4, segment_class=8,
                 compute_dtype="float32", scan_steps=2).validate()
    for kind in ("scan", "step", "eval"):
        out = probe_memory(cfg, n_items=4, kind=kind)
        assert out["kind"] == kind
        assert out["total_bytes"] > 0, out
    auto = probe_memory(cfg, n_items=4)
    assert auto["kind"] == "scan"  # scan_steps=2 -> auto picks scan


def test_hbm_probe_cycle(tmp_path):
    """Cycle configs probe their real fused two-domain program (scan and
    per-step both lower with the (ix_a, ix_b) index tuple)."""
    from sggan_tpu.config import Config
    from sggan_tpu.utils.hbm import probe_memory

    cfg = Config(dataset_dir=str(tmp_path), loss_mode="cycle",
                 use_resnet=True, batch_size=1, image_height=32,
                 image_width=32, ngf=4, ndf=4, segment_class=8,
                 compute_dtype="float32", scan_steps=2).validate()
    for kind in ("scan", "step"):
        out = probe_memory(cfg, n_items=2, kind=kind)
        assert out["kind"] == kind
        assert out["total_bytes"] > 0, out


def test_hbm_oom_parse():
    """The probe's fit verdict is compile success; on failure it parses
    the TPU compiler's used/limit bytes out of the OOM message."""
    from sggan_tpu.utils.hbm import _parse_oom

    out = _parse_oom("XLA:TPU compile permanent error. Ran out of memory "
                     "in memory space hbm. Used 15.75G of 15.75G hbm.")
    assert out["oom_used_bytes"] == int(15.75 * 2 ** 30)
    assert out["oom_limit_bytes"] == int(15.75 * 2 ** 30)
    out = _parse_oom("used 900M of 16G")
    assert out["oom_used_bytes"] == 900 * 2 ** 20
    assert _parse_oom("some unrelated failure") == {}
