"""Rendering server: health + render endpoints over real HTTP (CPU)."""

import json
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server():
    import argparse

    from http.server import ThreadingHTTPServer

    from dist_renderer_tpu.tasks import serve as srv_mod
    from dist_renderer_tpu.tasks.common import add_common_args

    ap = argparse.ArgumentParser()
    add_common_args(ap)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--host", default="127.0.0.1")
    args = ap.parse_args([
        "--cpu", "--no-cache", "--fit-steps", "150",
        "--decoder-width", "24", "--decoder-depth", "4", "--latent-size", "8",
        "--img", "24", "--march-steps", "32", "--shape", "sphere",
    ])

    do_render, latent0, dcfg = srv_mod.build_engine(args)

    # reuse serve.py's handler by invoking main-level pieces inline
    import io

    import jax
    import jax.numpy as jnp
    from http.server import BaseHTTPRequestHandler

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
            self._send(200, json.dumps({"status": "ok"}).encode())

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n) or b"{}")
            out = do_render(
                latent0, float(req.get("azimuth", 30.0)), 20.0, 2.2
            )
            body = json.dumps({
                "hits": int(np.asarray(out.mask).sum()),
                "depth_min": float(
                    np.where(np.asarray(out.mask), np.asarray(out.depth), np.inf).min()
                ),
            }).encode()
            self._send(200, body)

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()


def test_health(server):
    with urllib.request.urlopen(f"{server}/health", timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"


def test_render_request(server):
    req = urllib.request.Request(
        f"{server}/render",
        data=json.dumps({"azimuth": 45.0}).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        out = json.loads(r.read())
    assert out["hits"] > 0
    assert 1.0 < out["depth_min"] < 2.2
