"""Serving-path tests: AOT export round-trip and the HTTP translate
service end-to-end."""

import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from sggan_tpu.config import Config
from sggan_tpu.models import generator_resnet
from sggan_tpu.utils import export as gexport


def test_export_roundtrip(tmp_path):
    params = generator_resnet.init(jax.random.PRNGKey(0), ngf=4)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
    expect = generator_resnet.apply(params, x, compute_dtype=jnp.float32)

    blob = gexport.export_generator(generator_resnet.apply, params,
                                    (32, 32), compute_dtype=jnp.float32)
    path = tmp_path / "gen.stablehlo"
    gexport.save(str(path), blob)
    fn = gexport.load(str(path))
    got = fn(np.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


def _post_png(port, arr):
    img = Image.fromarray(arr)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/translate", data=buf.getvalue(),
        headers={"Content-Type": "image/png"})
    with urllib.request.urlopen(req) as r:
        return np.asarray(Image.open(io.BytesIO(r.read())))


def test_http_service_artifact_path(tmp_path):
    """The deployment path: --export bakes checkpoint + input convention
    into a StableHLO artifact; serve() loads it without building a
    Trainer, and serves identical pixels to the fallback jit path."""
    from sggan_tpu import serve as srv

    cfg = Config(dataset_dir=str(tmp_path), image_height=32, image_width=32,
                 ngf=4, ndf=4, segment_class=8, compute_dtype="float32",
                 use_resnet=True, checkpoint_dir=str(tmp_path / "ckpt"))
    art = str(tmp_path / "gen.stablehlo")
    srv.export_artifact(cfg, art)
    rng_img = np.random.default_rng(1).integers(0, 255, (32, 32, 3),
                                                np.uint8)

    httpd = srv.serve(cfg, port=0, block=False, artifact=art)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz") as r:
            health = json.loads(r.read())
        assert health["artifact"] is True
        fake_art = _post_png(port, rng_img)
        assert fake_art.shape == (32, 32, 3)
    finally:
        httpd.shutdown()

    # fallback (no artifact) must produce the same pixels (same fresh-init
    # params: both paths build Trainer with the same cfg/data_seed)
    httpd = srv.serve(cfg, port=0, block=False)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        fake_jit = _post_png(port, rng_img)
    finally:
        httpd.shutdown()
    np.testing.assert_allclose(fake_art.astype(int), fake_jit.astype(int),
                               atol=1)


def test_serve_cli_port_value_form(tmp_path, monkeypatch):
    """Regression: `--port 8000` (space-separated) must parse — the old
    main() re-parsed argv minus only the '--port' token and crashed on
    the bare value."""
    from sggan_tpu import serve as srv

    seen = {}
    monkeypatch.setattr(srv, "serve",
                        lambda cfg, port, artifact=None:
                        seen.update(port=port, cfg=cfg))
    srv.main(["--port", "8123", "--img_height", "32", "--img_width", "32",
              "--ngf", "4", "--ndf", "4", "--segment_class", "8",
              "--dataset_dir", str(tmp_path)])
    assert seen["port"] == 8123
    assert seen["cfg"].image_height == 32


def test_http_service(tmp_path):
    from sggan_tpu import serve as srv

    cfg = Config(dataset_dir=str(tmp_path), image_height=32, image_width=32,
                 ngf=4, ndf=4, segment_class=8, compute_dtype="float32",
                 checkpoint_dir=str(tmp_path / "ckpt"))
    httpd = srv.serve(cfg, port=0, block=False)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz") as r:
            health = json.loads(r.read())
        assert health["ok"] and health["image_size"] == [32, 32]
        assert health["checkpoint_loaded"] is False

        img = Image.fromarray(
            np.random.default_rng(0).integers(0, 255, (48, 64, 3),
                                              np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/translate", data=buf.getvalue(),
            headers={"Content-Type": "image/png"})
        with urllib.request.urlopen(req) as r:
            out = r.read()
        fake = np.asarray(Image.open(io.BytesIO(out)))
        assert fake.shape == (32, 32, 3)
        assert fake.dtype == np.uint8
    finally:
        httpd.shutdown()


def test_export_bakes_eval_sharpen(tmp_path):
    """--eval_sharpen is part of the test-time convention the AOT
    artifact bakes in: an inf-sharpened artifact emits hard +-1."""
    from sggan_tpu import serve as srv

    cfg = Config(dataset_dir=str(tmp_path), image_height=32, image_width=32,
                 ngf=4, ndf=4, segment_class=8, compute_dtype="float32",
                 use_resnet=True, checkpoint_dir=str(tmp_path / "ckpt"),
                 eval_sharpen=float("inf"))
    art = str(tmp_path / "gen_sharp.stablehlo")
    srv.export_artifact(cfg, art)
    fn = gexport.load(art)
    y = np.asarray(fn(np.random.default_rng(2)
                      .random((1, 32, 32, 3)).astype(np.float32)))
    assert set(np.unique(y)) <= {-1.0, 0.0, 1.0}
    assert np.mean(np.abs(y) == 1.0) > 0.99
