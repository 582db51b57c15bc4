"""Minimal rendering server: loads a decoder once, keeps compiled render
programs warm, answers JSON render requests over HTTP.

The reference is a demo-script codebase; this is the deployment-shaped
surface on top of the same engine: one process owns the TPU, requests
reuse the jitted render (recompiles only on new image sizes).

  python -m dist_renderer_tpu.tasks.serve --port 8765 --img 256 &
  curl -s localhost:8765/health
  curl -s -X POST localhost:8765/render -d '{"azimuth": 30, "elevation": 20}' \
      -o view.png                                  # depth/normal/sil panel
  curl -s -X POST localhost:8765/render -d '{"format": "json"}' | head -c 200

Request fields (all optional): latent (list[float]), azimuth, elevation,
distance, format ("png" panel | "json" raw arrays).
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

import jax
import jax.numpy as jnp


def build_engine(args):
    from dist_renderer_tpu.models.decoder import make_precise_sdf
    from dist_renderer_tpu.ops.renderer import make_march_factory, render
    from dist_renderer_tpu.tasks.common import (
        default_camera, load_task_decoder, make_render_cfg,
    )

    params, latent0, dcfg = load_task_decoder(args)
    cfg = make_render_cfg(args)
    sdf_fn = make_precise_sdf(params, dcfg)
    factory = make_march_factory(params, dcfg, cfg)

    lock = threading.Lock()  # one TPU program at a time

    def do_render(latent, azimuth, elevation, distance):
        cam = default_camera(args.img, distance, (elevation, azimuth))
        with lock:
            out = render(sdf_fn, latent, cam, cfg, factory)
            jax.block_until_ready(out.depth)
        return out

    # warm the compile at startup so the first request is fast
    do_render(latent0, 30.0, 20.0, 2.2)
    return do_render, latent0, dcfg


def main(argv=None):
    from dist_renderer_tpu.tasks.common import add_common_args

    ap = argparse.ArgumentParser(description=__doc__)
    add_common_args(ap)
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument("--host", default="127.0.0.1")
    args = ap.parse_args(argv)

    do_render, latent0, dcfg = build_engine(args)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, code, body, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, json.dumps({
                    "status": "ok",
                    "latent_size": int(latent0.shape[0]),
                    "img": args.img,
                    "device": str(jax.devices()[0]),
                }).encode())
            else:
                self._send(404, b'{"error": "use GET /health or POST /render"}')

        def do_POST(self):
            if self.path != "/render":
                self._send(404, b'{"error": "POST /render"}')
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                latent = (
                    jnp.asarray(req["latent"], jnp.float32)
                    if "latent" in req else latent0
                )
                out = do_render(
                    latent,
                    float(req.get("azimuth", 30.0)),
                    float(req.get("elevation", 20.0)),
                    float(req.get("distance", 2.2)),
                )
                if req.get("format", "png") == "json":
                    body = json.dumps({
                        "depth": np.asarray(out.depth).tolist(),
                        "mask": np.asarray(out.mask).astype(int).tolist(),
                    }).encode()
                    self._send(200, body)
                else:
                    from PIL import Image

                    from dist_renderer_tpu.utils.viz import (
                        colorize_depth, colorize_normal, colorize_silhouette,
                        panel,
                    )

                    img = panel([
                        colorize_depth(out.depth, out.mask),
                        colorize_normal(out.normal, out.mask),
                        colorize_silhouette(out.min_sdf),
                    ])
                    buf = io.BytesIO()
                    Image.fromarray(img).save(buf, "PNG")
                    self._send(200, buf.getvalue(), "image/png")
            except Exception as e:  # noqa: BLE001 — report, don't crash the server
                self._send(400, json.dumps({"error": str(e)}).encode())

    srv = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"serving on http://{args.host}:{args.port}  (GET /health, POST /render)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
