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
  POST /match_events     -> body: raw little-endian uint32 packed AER words
                            (bin_idx * n_in + pixel, the ingest wire format
                            of ops/events_device; 0xFFFFFFFF = padding);
                            header X-Bin-Count (1..MAX_EVENT_BINS) = number
                            of query bins.  Device scatter + quantized
                            even-spread forward in one program; response
                            shape = /match's.  Bin counts are bucketed to
                            powers of two internally so distinct request
                            sizes reuse compiled executables.

Stateful ONLINE sessions (the chip's continuous-network semantics — the
quantized network's membranes persist across a client's timebins, exactly as
runtime/stream.py models the Speck):

  POST /stream/open      -> {"session": id}; JSON body optional:
                            {"thresholds": "chip" | "unit"} (default chip,
                            the 10/2 on-chip regime of run_speck.py:143-144)
  POST /stream/bin       -> X-Session header + raw uint8 (roi, roi) frame;
                            response: {"bin": n, "counts": [...],
                                       "top_place": int, "latency_ms": ...}
  POST /stream/close     -> X-Session header; response: {"closed": true,
                            "bins": n}

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

# Request-body ceiling: generous for any real frame batch (4096 frames of
# 128x128 is 64 MB) while bounding what an unauthenticated client can make
# the host buffer.
MAX_BODY_BYTES = 256 * 1024 * 1024
MAX_EVENT_BINS = 4096  # /match_events bin-axis bound (see match_events)


class _BinBatcher:
    """Micro-batches concurrent /stream/bin dispatches into ONE device
    program (stream_forward_counts_carry_batched): under fleet load, B
    robots' bins advance together instead of serializing B dispatches.

    A daemon worker drains a queue (blocking on the first item, then
    collecting arrivals for a short window), groups items by quantized
    params, pads the batch to a power of two (one compiled executable per
    bucket), and writes each session's membranes back under the host lock.
    A session appears at most once per batch — a second bin for the same
    session defers to the next batch so its carry stays ordered.
    """

    def __init__(self, host: "ModelHost", window_s: float = 0.002):
        import queue

        self.host = host
        self.window_s = window_s
        self._q: "queue.Queue" = queue.Queue()
        self.dispatches = 0  # device programs run
        self.items_served = 0  # bins served (>= dispatches under load)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def run(self, sess: dict, raster: np.ndarray):
        """Submit one bin; blocks until its batch lands.  Returns
        (counts, bin_idx).  Waits with a liveness check so a dead worker
        thread surfaces as a 500 instead of wedging the endpoint forever."""
        done = threading.Event()
        item = {"sess": sess, "raster": raster, "done": done, "out": None}
        self._q.put(item)
        while not done.wait(timeout=1.0):
            if not self._thread.is_alive():  # defense in depth: _worker
                # fails items rather than dying, but a wedged/killed thread
                # must still not block clients indefinitely
                raise RuntimeError("stream batcher worker is not running")
        if isinstance(item["out"], Exception):
            raise item["out"]
        return item["out"]

    def _worker(self) -> None:
        import queue

        while True:
            items = [self._q.get()]
            # Any unexpected error in batch assembly must fail the collected
            # items (clients get a 500), never kill the worker thread —
            # a silently dead worker would wedge every subsequent request.
            requeued_ids: set = set()
            try:
                # Only pay the batching window when other sessions could
                # actually join (a lone robot's bins must not eat 2 ms of
                # pure sleep each).
                if len(self.host._sessions) > 1:
                    time.sleep(self.window_s)
                while True:
                    try:
                        items.append(self._q.get_nowait())
                    except queue.Empty:
                        break
                # One bin per session per batch: defer duplicates.
                batch, deferred, seen = [], [], set()
                for it in items:
                    sid = id(it["sess"])
                    (deferred if sid in seen else batch).append(it)
                    seen.add(sid)
                for it in deferred:
                    self._q.put(it)
                    requeued_ids.add(id(it))
                self._dispatch(batch)
            except Exception as e:  # noqa: BLE001 — fail the wave, keep serving
                for it in items:
                    # A re-queued duplicate is NOT failed here: it is still in
                    # the queue and will be served on a later wave; marking it
                    # done would 500 the client while the worker later
                    # processes it anyway — integrating the (retried) bin
                    # twice into the session's membrane carry.
                    if id(it) in requeued_ids:
                        continue
                    if not it["done"].is_set():
                        it["out"] = e
                        it["done"].set()

    def _dispatch(self, batch) -> None:
        # Group by quantized params (sessions opened with the same thresholds
        # share one cached QuantizedParams, so fleet sessions batch together).
        groups: dict = {}
        for it in batch:
            groups.setdefault(id(it["sess"]["qp"]), []).append(it)
        with self.host._lock:
            for its in groups.values():
                try:
                    self._dispatch_group(its)
                except Exception as e:  # noqa: BLE001 — fail ONLY this group:
                    # other groups' sessions already advanced and completed.
                    for it in its:
                        if not it["done"].is_set():
                            it["out"] = e
                            it["done"].set()
            self.dispatches += len(groups)
            self.items_served += len(batch)

    def _dispatch_group(self, its) -> None:
        import jax.numpy as jnp

        from lens_tpu.runtime.stream import (
            stream_forward_counts_carry,
            stream_forward_counts_carry_batched,
        )

        import jax

        # Session membranes live as HOST numpy: one h2d rides the dispatch
        # and one device_get fetches everything — per-row device slices or
        # device-side stacks would each be a relay roundtrip (measured: a
        # 4-session wave cost ~15 roundtrips ≈ 750 ms through the tunnel).
        qp = its[0]["sess"]["qp"]
        if len(its) == 1:
            it = its[0]
            sess = it["sess"]
            counts_d, vf_d, vo_d, _ = stream_forward_counts_carry(
                qp, jnp.asarray(it["raster"]), sess["v_feat"], sess["v_out"]
            )
            counts, sess["v_feat"], sess["v_out"] = jax.device_get(
                (counts_d, vf_d, vo_d)
            )
            self._finish(it, counts)
            return
        b = len(its)
        b_pad = 1 << (b - 1).bit_length()  # one compiled executable per bucket
        rasters = np.zeros((b_pad,) + its[0]["raster"].shape, its[0]["raster"].dtype)
        for i, it in enumerate(its):
            rasters[i] = it["raster"]
        vf = np.zeros((b_pad, qp.w_feat.shape[1]), np.int32)
        vo = np.zeros((b_pad, qp.w_out.shape[1]), np.int32)
        for i, it in enumerate(its):
            vf[i] = it["sess"]["v_feat"]
            vo[i] = it["sess"]["v_out"]
        if len(jax.devices()) > 1:
            # Fleet wave sharded over the mesh: session axis on 'data', so
            # wave capacity scales with the device count (bit-exact vs the
            # single-device batch — tests/test_sharding.py fleet test).
            from lens_tpu.parallel.mesh import sharded_fleet_step

            counts_np, vf_np, vo_np, _ = sharded_fleet_step(qp, rasters, vf, vo)
        else:
            counts_b, vf_b, vo_b, _ = stream_forward_counts_carry_batched(
                qp, jnp.asarray(rasters), jnp.asarray(vf), jnp.asarray(vo)
            )
            counts_np, vf_np, vo_np = jax.device_get((counts_b, vf_b, vo_b))
        for i, it in enumerate(its):
            it["sess"]["v_feat"] = vf_np[i]
            it["sess"]["v_out"] = vo_np[i]
            self._finish(it, counts_np[i])

    def _finish(self, it, counts: np.ndarray) -> None:
        sess = it["sess"]
        bin_idx = sess["bins"]
        sess["bins"] += 1
        sess["last_used"] = time.monotonic()
        it["out"] = (counts, bin_idx)
        it["done"].set()


class ModelHost:
    """Thread-safe wrapper owning the compiled model + request statistics."""

    def __init__(self, cfg: LensConfig, model: Optional[LensModel] = None):
        self.cfg = cfg
        self.model = model or LensModel.from_checkpoint(cfg)
        self.sel = center_pixel_flat_indices(cfg.roi_dim, cfg.dims)
        self._lock = threading.Lock()  # one dispatch at a time per device
        self.latencies_ms: List[float] = []
        self.requests = 0
        self._sessions: dict = {}
        self._session_seq = 0
        self.max_sessions = 64  # bound host memory: evict the stalest session
        self._qp_cache: dict = {}  # thresholds mode -> shared QuantizedParams
        self._batcher: Optional[_BinBatcher] = None
        # Warm-up compile so the first request pays no compilation latency.
        warm = np.zeros((1, cfg.input), np.float32)
        self.model.spike_counts(warm)

    def _record_and_respond(self, counts: np.ndarray, latency: float) -> dict:
        """Shared stats recording + response shape for the match endpoints."""
        with self._lock:  # handler threads are concurrent; unguarded
            # append/trim/increment lose counts and race the window trim
            self.latencies_ms.append(latency)
            if len(self.latencies_ms) > 10_000:  # bounded stats window
                del self.latencies_ms[:5_000]
            self.requests += 1
        return {
            "matches": [int(c) for c in counts.argmax(axis=1)],
            "counts": counts.astype(int).tolist(),
            "latency_ms": round(latency, 3),
        }

    def match(self, frames_u8: np.ndarray) -> dict:
        """(n, roi, roi) uint8 frames -> matches + spike counts."""
        n = frames_u8.shape[0]
        intens = (
            frames_u8.reshape(n, -1)[:, self.sel].astype(np.float32) / 255.0
        )
        t0 = time.perf_counter()
        with self._lock:
            counts = self.model.spike_counts(intens)
        return self._record_and_respond(
            counts, (time.perf_counter() - t0) * 1000.0
        )

    def match_events(self, packed: np.ndarray, n_bins: int) -> dict:
        """AER-sparse batch evaluation: packed uint32 words (bin*n_in+pix,
        the ingest stage's wire format — ops/events_device) are expanded by
        a device scatter and evaluated by the quantized even-spread forward
        in one program.  The deployment-shaped request body: a robot's
        LUT-filtered events, no dense frames on the wire."""
        from lens_tpu.core.network import SpikeThresholds
        from lens_tpu.ops.events_device import aer_counts_forward
        from lens_tpu.runtime.speck_sim import discretize
        from lens_tpu.runtime.stream import substeps_for

        from lens_tpu.ops.events_device import PACKED_SENTINEL

        n_in = self.cfg.input
        if not (0 < n_bins <= MAX_EVENT_BINS):
            # Unbounded n_bins would let a 4-byte request allocate an
            # (n_bins, n_in) raster of arbitrary size and trigger a fresh
            # jit compile under the device lock — the same DoS posture as
            # MAX_BODY_BYTES, applied to the shape.
            raise ValueError(
                f"X-Bin-Count must be 1..{MAX_EVENT_BINS}, got {n_bins}"
            )
        real = packed[packed != PACKED_SENTINEL]  # sentinel words = padding
        if real.size and int(real.max()) >= n_bins * n_in:
            raise ValueError(
                f"packed word out of range for {n_bins} bins x {n_in} inputs"
            )
        # Bucket BOTH traced axes to the next power of two: one compiled
        # executable per (bin-bucket, word-bucket) pair instead of one per
        # request size.  Without the word-axis bucket, every distinct body
        # LENGTH is a fresh XLA compile held under the device lock — an
        # unauthenticated client could force unbounded compile churn (the
        # DoS posture MAX_EVENT_BINS exists to prevent).  Padded bins
        # receive no events and count zero (sliced off below); padding
        # words are PACKED_SENTINEL, which the device scatter discards
        # (covered by test_packed_aer_ingest_matches_dense_counts).
        n_bins_p = 1 << max(0, (n_bins - 1).bit_length())
        n_words_p = (
            1 if packed.size <= 1 else 1 << (packed.size - 1).bit_length()
        )
        if n_words_p > packed.size:
            packed = np.concatenate(
                [
                    packed,
                    np.full(
                        n_words_p - packed.size, PACKED_SENTINEL, np.uint32
                    ),
                ]
            )
        steps = substeps_for(self.cfg.timebin)
        t0 = time.perf_counter()
        with self._lock:
            qp = self._qp_cache.get("unit")
            if qp is None:
                qp = discretize(
                    self.model.params, SpikeThresholds(), self.cfg.min_v_mem
                )
                self._qp_cache["unit"] = qp
            import jax.numpy as jnp

            counts = np.asarray(
                aer_counts_forward(
                    qp, jnp.asarray(packed), n_bins_p, n_in, steps
                )
            )[:n_bins]
        return self._record_and_respond(
            counts, (time.perf_counter() - t0) * 1000.0
        )

    # -- stateful online streaming sessions ---------------------------------
    def stream_open(self, thresholds: str = "chip") -> dict:
        """New online session: quantized network + fresh membranes that
        persist across this session's bins (chip semantics)."""
        from lens_tpu.core.network import SpikeThresholds
        from lens_tpu.runtime.speck_sim import discretize
        from lens_tpu.runtime.stream import STREAM_THRESHOLDS

        if thresholds not in ("chip", "unit"):
            raise ValueError(
                f"unknown thresholds mode {thresholds!r} (use 'chip' or 'unit')"
            )
        with self._lock:
            # One shared QuantizedParams per thresholds mode (the validated
            # set bounds the cache at two entries): fleet sessions with the
            # same mode micro-batch into one device program (_BinBatcher).
            # Cache + batcher init live under the lock — a racing pair of
            # opens must not create distinct qp objects (which would never
            # share a batch) or a second worker thread.
            qp = self._qp_cache.get(thresholds)
            if qp is None:
                thr = (
                    STREAM_THRESHOLDS if thresholds == "chip" else SpikeThresholds()
                )
                qp = discretize(self.model.params, thr, self.cfg.min_v_mem)
                self._qp_cache[thresholds] = qp
            if self._batcher is None:
                self._batcher = _BinBatcher(self)
            # Bounded session table: a client that never closes cannot grow
            # host memory without bound — the least-recently-used session is
            # evicted (each holds a quantized weight copy + membranes).
            if len(self._sessions) >= self.max_sessions:
                stalest = min(
                    self._sessions, key=lambda k: self._sessions[k]["last_used"]
                )
                del self._sessions[stalest]
            self._session_seq += 1
            sid = f"s{self._session_seq}"
            self._sessions[sid] = {
                "qp": qp,
                "v_feat": np.zeros((qp.w_feat.shape[1],), np.int32),
                "v_out": np.zeros((qp.w_out.shape[1],), np.int32),
                "bins": 0,
                "thresholds": thresholds,
                "last_used": time.monotonic(),
            }
        return {"session": sid, "thresholds": thresholds}

    def stream_bin(self, sid: str, frame_u8: np.ndarray) -> dict:
        from lens_tpu.runtime.stream import even_spread_raster, substeps_for

        # Same flat-index selection match() uses (self.sel) — one cache,
        # one definition of the center-pixel downsample.
        down = frame_u8.reshape(-1)[self.sel].astype(np.int64)
        steps = substeps_for(self.cfg.timebin)
        raster = even_spread_raster(down, steps)
        t0 = time.perf_counter()
        with self._lock:
            sess = self._sessions.get(sid)
        if sess is None:
            raise KeyError(f"unknown session {sid}")
        # The batcher serializes each session's carry and micro-batches
        # concurrent sessions into one device program.
        counts, bin_idx = self._batcher.run(sess, raster)
        return {
            "session": sid,
            "bin": bin_idx,
            "counts": counts.astype(int).tolist(),
            "top_place": int(counts.argmax()),
            "latency_ms": round((time.perf_counter() - t0) * 1000.0, 3),
        }

    def stream_close(self, sid: str) -> dict:
        with self._lock:
            sess = self._sessions.pop(sid, None)
        if sess is None:
            raise KeyError(f"unknown session {sid}")
        return {"closed": True, "bins": sess["bins"]}

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
        batch = (
            {
                "stream_bins": self._batcher.items_served,
                "stream_dispatches": self._batcher.dispatches,
            }
            if self._batcher is not None
            else {}
        )
        return {"requests": self.requests, **pct, **batch}


def _make_handler(host: ModelHost):
    class Handler(BaseHTTPRequestHandler):
        # Socket timeout: a client that declares a Content-Length but stalls
        # mid-body would otherwise pin its handler thread in rfile.read
        # forever (slow-loris on the 0.0.0.0-bound endpoint); on timeout the
        # connection is closed and the thread freed.
        timeout = 30

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
            try:
                length = int(self.headers.get("Content-Length", 0))
                # Bound host memory BEFORE buffering the body: the endpoint
                # binds 0.0.0.0 and a client-declared 10 GB Content-Length
                # must not be read into RAM to find out it is invalid.
                if length < 0 or length > MAX_BODY_BYTES:
                    self._send(
                        413,
                        {"error": f"body too large ({length} bytes; "
                                  f"limit {MAX_BODY_BYTES})"},
                    )
                    return
                raw = self.rfile.read(length)
                if self.path == "/match":
                    n = int(self.headers.get("X-Frame-Count", 1))
                    roi = int(self.headers.get("X-Roi-Dim", host.cfg.roi_dim))
                    # The center-pixel selection (host.sel) is computed for
                    # the host's configured geometry; a different client ROI
                    # would silently select wrong pixels (or IndexError as a
                    # 500), so it is a validation error, not a view change.
                    if roi != host.cfg.roi_dim:
                        self._send(
                            400,
                            {"error": f"X-Roi-Dim {roi} does not match the "
                                      f"host's roi_dim {host.cfg.roi_dim}"},
                        )
                        return
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
                elif self.path == "/match_events":
                    n_bins = int(self.headers.get("X-Bin-Count", 0))
                    if n_bins <= 0:
                        self._send(400, {"error": "X-Bin-Count required (> 0)"})
                        return
                    if length % 4 != 0:
                        self._send(
                            400,
                            {"error": f"body must be uint32 words, got "
                                      f"{length} bytes"},
                        )
                        return
                    packed = np.frombuffer(raw, np.uint32)
                    self._send(200, host.match_events(packed, n_bins))
                elif self.path == "/stream/open":
                    opts = json.loads(raw) if raw else {}
                    if not isinstance(opts, dict):
                        # Valid JSON but not an object (e.g. a bare "chip"
                        # string) is a client error, not a 500.
                        self._send(400, {"error": "body must be a JSON object"})
                        return
                    self._send(200, host.stream_open(opts.get("thresholds", "chip")))
                elif self.path == "/stream/bin":
                    sid = self.headers.get("X-Session", "")
                    roi = host.cfg.roi_dim
                    if length != roi * roi:
                        self._send(
                            400,
                            {"error": f"expected {roi * roi} bytes, got {length}"},
                        )
                        return
                    frame = np.frombuffer(raw, np.uint8).reshape(roi, roi)
                    self._send(200, host.stream_bin(sid, frame))
                elif self.path == "/stream/close":
                    self._send(200, host.stream_close(self.headers.get("X-Session", "")))
                else:
                    self._send(404, {"error": "unknown path"})
            except KeyError as e:
                self._send(404, {"error": str(e)})
            except ValueError as e:
                self._send(400, {"error": str(e)})
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
