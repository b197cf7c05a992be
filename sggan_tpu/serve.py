"""Minimal production inference service.

POST a PNG to /translate and receive the translated PNG; GET /healthz for
liveness.  The generator runs as a single jitted (or AOT-exported)
function with a fixed input shape; requests are decoded on the host,
resized device-side, translated, and re-encoded.

    python -m sggan_tpu.serve --checkpoint_dir ./checkpoint \
        --dataset_dir city --img_height 128 --img_width 128 --port 8000

No reference counterpart (SURVEY lists only the batch test loop); this is
the deployment surface expected of a production framework.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import numpy as np
from PIL import Image

from .config import Config, build_parser, parse_args
from .train.trainer import Trainer


class _Service:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.trainer = Trainer(cfg.replace(phase="test"))
        from .utils import checkpoint as ckpt
        restored = ckpt.load(self.trainer.state, cfg.checkpoint_dir,
                             cfg.dataset_dir)
        self.loaded = restored is not None
        if self.loaded:
            self.trainer.state = restored
        self._lock = threading.Lock()
        # warm the compile with a zero image
        h, w = cfg.image_height, cfg.image_width
        self.trainer.generate(np.zeros((1, h, w, 3), np.float32))

    def translate_png(self, png_bytes: bytes) -> bytes:
        img = Image.open(io.BytesIO(png_bytes)).convert("RGB")
        h, w = self.cfg.image_height, self.cfg.image_width
        img = img.resize((w, h), Image.BILINEAR)
        x = np.asarray(img, np.float32)[None] / 255.0
        with self._lock:  # one device stream
            fake = self.trainer.generate(x)
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


def serve(cfg: Config, port: int = 8000, block: bool = True):
    service = _Service(cfg)
    httpd = ThreadingHTTPServer(("0.0.0.0", port), make_handler(service))
    print(f"serving on :{port} (checkpoint_loaded={service.loaded})")
    if block:
        httpd.serve_forever()
    return httpd


def main(argv=None):
    p = build_parser()
    p.add_argument("--port", type=int, default=8000)
    ns = p.parse_args(argv)
    port = ns.port
    cfg = parse_args([a for a in (argv or []) if not a.startswith("--port")])
    serve(cfg, port)


if __name__ == "__main__":
    import sys
    main(sys.argv[1:])
