"""Minimal production inference service.

POST a PNG to /translate and receive the translated PNG; GET /healthz for
liveness.  The deployment artifact is an AOT-exported (jax.export /
StableHLO) generator that reloads and executes without retracing Python —
pass it as --artifact; without one the service falls back to building the
trainer's jitted generator from the latest checkpoint.

    # one-time: bake checkpoint + test-time input convention into an artifact
    python -m sggan_tpu.serve --export --artifact gen.stablehlo \
        --checkpoint_dir ./checkpoint --dataset_dir city
    # serve it
    python -m sggan_tpu.serve --artifact gen.stablehlo --port 8000

No reference counterpart (SURVEY lists only the batch test loop); this is
the deployment surface expected of a production framework.
"""

from __future__ import annotations

import io
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import jax
import numpy as np
from PIL import Image

from .config import Config, build_parser, config_from_namespace


def export_artifact(cfg: Config, path: str) -> bool:
    """Load the latest checkpoint and AOT-export the FULL test-time
    generator (including the test_uint8_input input-scale compat,
    model.py:555-561) to `path`.  Returns checkpoint_loaded."""
    import jax.numpy as jnp

    from .train.trainer import Trainer
    from .utils import checkpoint as ckpt
    from .utils import export as gexport

    trainer = Trainer(cfg.replace(phase="test"))
    restored = ckpt.load(trainer.state, cfg.checkpoint_dir, cfg.dataset_dir)
    loaded = restored is not None
    if loaded:
        trainer.state = restored
    # bake the EMA shadow when trained with --gen_ema, matching what
    # Trainer.generate serves at eval time
    gen_params = (trainer.state.ema if trainer.state.ema is not None
                  else trainer.state.gen_params)
    gen_bn = trainer.state.gen_bn

    def fwd(x):  # x: (1, H, W, 3) float32 in [0, 1]
        if cfg.test_uint8_input:
            x = jnp.round(x * 255.0)
        y = trainer._gen_forward(gen_params, gen_bn, x)
        if cfg.eval_sharpen != 1.0:
            # bake the eval-time sharpening knob into the artifact,
            # matching what trainer.generate serves (evaluate.sharpen)
            from .train.evaluate import sharpen
            y = sharpen(y, cfg.eval_sharpen)
        return y

    h, w = cfg.image_height, cfg.image_width
    spec = jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32)
    gexport.save(path, gexport.export_fn(fwd, spec))
    return loaded


class _Service:
    def __init__(self, cfg: Config, artifact: Optional[str] = None):
        self.cfg = cfg
        h, w = cfg.image_height, cfg.image_width
        self.artifact = bool(artifact) and os.path.exists(artifact)
        if self.artifact:
            # deployment path: serialized StableHLO, no Python retrace,
            # checkpoint + input convention baked in at export time
            from .utils import export as gexport
            self._fn = gexport.load(artifact)
            self.loaded = True
        else:
            from .train.trainer import Trainer
            from .utils import checkpoint as ckpt
            trainer = Trainer(cfg.replace(phase="test"))
            restored = ckpt.load(trainer.state, cfg.checkpoint_dir,
                                 cfg.dataset_dir)
            self.loaded = restored is not None
            if self.loaded:
                trainer.state = restored
            self._fn = lambda x: trainer.generate(x)
        self._lock = threading.Lock()
        # warm the compile/execute path with a zero image
        self._fn(np.zeros((1, h, w, 3), np.float32))

    def translate_png(self, png_bytes: bytes) -> bytes:
        img = Image.open(io.BytesIO(png_bytes)).convert("RGB")
        h, w = self.cfg.image_height, self.cfg.image_width
        img = img.resize((w, h), Image.BILINEAR)
        x = np.asarray(img, np.float32)[None] / 255.0
        with self._lock:  # one device stream
            fake = np.asarray(self._fn(x))
        out = ((fake[0] + 1.0) / 2.0 * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(out).save(buf, format="PNG")
        return buf.getvalue()


def make_handler(service: _Service):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path == "/healthz":
                body = json.dumps({
                    "ok": True, "checkpoint_loaded": service.loaded,
                    "artifact": service.artifact,
                    "backend": jax.default_backend(),
                    "image_size": list(service.cfg.image_size),
                }).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def do_POST(self):
            if self.path != "/translate":
                self.send_error(404)
                return
            n = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(n)
            try:
                out = service.translate_png(data)
            except Exception as e:
                self.send_error(400, f"{type(e).__name__}: {e}")
                return
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

    return Handler


def serve(cfg: Config, port: int = 8000, block: bool = True,
          artifact: Optional[str] = None):
    service = _Service(cfg, artifact=artifact)
    httpd = ThreadingHTTPServer(("0.0.0.0", port), make_handler(service))
    print(f"serving on :{port} (checkpoint_loaded={service.loaded} "
          f"artifact={service.artifact})")
    if block:
        httpd.serve_forever()
    return httpd


def main(argv=None):
    p = build_parser()
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--artifact", default=None,
                   help="AOT-exported generator artifact; used when the "
                        "file exists, created by --export")
    p.add_argument("--export", action="store_true",
                   help="export the artifact to --artifact and exit")
    ns = p.parse_args(argv)
    cfg = config_from_namespace(ns)
    if ns.export:
        if not ns.artifact:
            p.error("--export requires --artifact PATH")
        loaded = export_artifact(cfg, ns.artifact)
        print(f"exported {ns.artifact} (checkpoint_loaded={loaded})")
        return
    serve(cfg, ns.port, artifact=ns.artifact)


if __name__ == "__main__":
    import sys
    main(sys.argv[1:])
