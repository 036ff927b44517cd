"""Minimal production serving endpoint for online VPR.

The reference's only "serving" story is the samna GUI loop on a devkit; this
module exposes the same capability as a network service: a persistent model
host that accepts event frames and returns place matches, suitable for a
robot or fleet client.

Protocol (HTTP, stdlib-only server — no framework dependency):

  GET  /healthz          -> {"status": "ok", "model": ..., "backend": ...}
  GET  /stats            -> request counts + latency percentiles
  POST /match            -> body: raw uint8 bytes of one (roi, roi) frame or
                            a batch (n, roi, roi); headers X-Frame-Count /
                            X-Roi-Dim optional (default 1 / config roi_dim).
                            Response: {"matches": [place...],
                                       "counts": [[...spike counts...]],
                                       "latency_ms": ...}

The device program is compiled once at startup (fixed shapes via the query
bucketing of ops/fused_forward.best_forward); each request is one dispatch.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np

from lens_tpu.config import LensConfig
from lens_tpu.data.dataset import center_pixel_flat_indices
from lens_tpu.models.lens import LensModel


class ModelHost:
    """Thread-safe wrapper owning the compiled model + request statistics."""

    def __init__(self, cfg: LensConfig, model: Optional[LensModel] = None):
        self.cfg = cfg
        self.model = model or LensModel.from_checkpoint(cfg)
        self.sel = center_pixel_flat_indices(cfg.roi_dim, cfg.dims)
        self._lock = threading.Lock()  # one dispatch at a time per device
        self.latencies_ms: List[float] = []
        self.requests = 0
        # Warm-up compile so the first request pays no compilation latency.
        warm = np.zeros((1, cfg.input), np.float32)
        self.model.spike_counts(warm)

    def match(self, frames_u8: np.ndarray) -> dict:
        """(n, roi, roi) uint8 frames -> matches + spike counts."""
        n = frames_u8.shape[0]
        intens = (
            frames_u8.reshape(n, -1)[:, self.sel].astype(np.float32) / 255.0
        )
        t0 = time.perf_counter()
        with self._lock:
            counts = self.model.spike_counts(intens)
        latency = (time.perf_counter() - t0) * 1000.0
        self.latencies_ms.append(latency)
        if len(self.latencies_ms) > 10_000:  # bounded stats window
            del self.latencies_ms[:5_000]
        self.requests += 1
        return {
            "matches": [int(c) for c in counts.argmax(axis=1)],
            "counts": counts.astype(int).tolist(),
            "latency_ms": round(latency, 3),
        }

    def stats(self) -> dict:
        lat = np.asarray(self.latencies_ms)
        pct = (
            {
                "p50_ms": round(float(np.percentile(lat, 50)), 3),
                "p95_ms": round(float(np.percentile(lat, 95)), 3),
                "p99_ms": round(float(np.percentile(lat, 99)), 3),
            }
            if len(lat)
            else {}
        )
        return {"requests": self.requests, **pct}


def _make_handler(host: ModelHost):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet; stats replace access logs
            pass

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                import jax

                self._send(
                    200,
                    {
                        "status": "ok",
                        "model": host.cfg.model_name(),
                        "backend": jax.default_backend(),
                    },
                )
            elif self.path == "/stats":
                self._send(200, host.stats())
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/match":
                self._send(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(length)
                n = int(self.headers.get("X-Frame-Count", 1))
                roi = int(self.headers.get("X-Roi-Dim", host.cfg.roi_dim))
                expected = n * roi * roi
                if length != expected:
                    self._send(
                        400,
                        {
                            "error": f"expected {expected} bytes for "
                            f"{n} frames of {roi}x{roi}, got {length}"
                        },
                    )
                    return
                frames = np.frombuffer(raw, np.uint8).reshape(n, roi, roi)
                self._send(200, host.match(frames))
            except Exception as e:  # noqa: BLE001 - surface to the client
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(cfg: LensConfig, port: int = 8471, model: Optional[LensModel] = None):
    """Start the serving endpoint; returns (server, host). Caller joins or
    shuts down via server.shutdown()."""
    host = ModelHost(cfg, model)
    server = ThreadingHTTPServer(("0.0.0.0", port), _make_handler(host))
    return server, host


def main(argv=None) -> int:
    from lens_tpu.config import build_arg_parser
    from lens_tpu.utils.jaxsetup import setup_jax

    setup_jax()
    parser = build_arg_parser()
    parser.add_argument("--port", type=int, default=8471)
    args = parser.parse_args(argv)
    cfg = LensConfig.from_dict(
        {k: v for k, v in vars(args).items() if k != "port"}
    )
    server, host = serve(cfg, args.port)
    print(f"serving {cfg.model_name()} on :{args.port}")
    server.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
