"""Minimal production HTTP front end for the streaming DepthEngine.

The reference has no serving layer at all (SURVEY.md §1); this is the
network story for ours: a stdlib-only (http.server) endpoint exposing
the engine over REST, usable with any checkpoint source — Orbax,
reference ``.pth``, or a StableHLO deployment artifact.

  camradepth serve ... --http-port 8080

API (all responses JSON unless noted):
  GET  /healthz   liveness + engine serving stats
  GET  /v1/info   model/engine geometry (batch, HxW, channels, classes)
  POST /v1/depth  body: one ``.npy`` array, float32 ``[H, W, C]`` or
                  ``[b, H, W, C]`` (b <= engine batch; padded inside).
                  Response: ``.npz`` with ``depth`` [b, H, W] metric
                  meters (or raw inverse encoding if the engine was
                  built decode_depth=False) and ``seg`` [b, H, W] int
                  labels when the variant has a seg head.

The engine's jitted forward is NOT thread-safe per request ordering;
a lock serializes device calls while the ThreadingHTTPServer keeps
I/O (request reads, response writes) concurrent.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Tuple

import numpy as np


def make_handler(engine, cfg):
    lock = threading.Lock()
    h, w = cfg.model.img_size
    c = cfg.model.input_channels

    class Handler(BaseHTTPRequestHandler):
        # quiet request logging (stdout belongs to the stats line)
        def log_message(self, *a):  # noqa: D102
            pass

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (http.server API)
            if self.path == "/healthz":
                self._json(200, {"status": "ok", **engine.stats()})
            elif self.path == "/v1/info":
                self._json(200, {
                    "batch_size": engine.batch_size,
                    "img_size": [h, w],
                    "input_channels": c,
                    "decode_depth": engine.decode_depth,
                    "max_depth": float(cfg.data.max_depth),
                })
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):  # noqa: N802
            if self.path != "/v1/depth":
                self._json(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                arr = np.load(io.BytesIO(self.rfile.read(n)),
                              allow_pickle=False)
            except Exception as e:  # malformed body -> client error
                self._json(400, {"error": f"expected a .npy body: {e}"})
                return
            if arr.ndim == 3:
                arr = arr[None]
            if (arr.ndim != 4 or arr.shape[1:] != (h, w, c)
                    or arr.shape[0] > engine.batch_size
                    or arr.shape[0] == 0):
                self._json(400, {"error": (
                    f"expected float32 [b<={engine.batch_size}, {h}, "
                    f"{w}, {c}] (or unbatched [H, W, C]), got "
                    f"{arr.dtype} {list(arr.shape)}"
                )})
                return
            with lock:  # device calls are serialized; I/O is not
                out = engine.infer_batch(
                    np.ascontiguousarray(arr, np.float32)
                )
            buf = io.BytesIO()
            np.savez(buf, **out)
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "application/x-npz")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def start_server(engine, cfg, host: str = "0.0.0.0", port: int = 8080,
                 ) -> Tuple[ThreadingHTTPServer, threading.Thread]:
    """Start the server on a daemon thread; returns (server, thread).
    ``port=0`` binds an ephemeral port (tests); the bound port is
    ``server.server_address[1]``. Call ``server.shutdown()`` to stop."""
    engine.warmup()  # compile before the first request, not during it
    srv = ThreadingHTTPServer((host, port), make_handler(engine, cfg))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, t


def serve_forever(engine, cfg, host: str, port: int) -> None:
    """Blocking CLI entry: serve until SIGINT, then print final stats."""
    srv, t = start_server(engine, cfg, host, port)
    print(json.dumps({
        "serving": f"http://{host}:{srv.server_address[1]}",
        "batch_size": engine.batch_size,
    }), flush=True)
    try:
        t.join()
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()
        print(json.dumps(engine.stats()), flush=True)
