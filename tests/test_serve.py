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
