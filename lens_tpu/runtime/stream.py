"""Online event-driven streaming VPR — the `--event_driven` mode.

Replaces the reference's hardware path (reference run_speck.py:107-358:
samna event graph + Speck2f chip + GUI + two unsynchronized threads) with a
race-free software pipeline:

  event source ──► native accumulate (ROI crop, hot-pixel filter, timebin
  cadence — run_speck.py:261-271 semantics) ──► quantized spiking network
  with the on-chip threshold overrides 10/2 (run_speck.py:143-144) ──►
  per-bin output spike counts ──► online sequence matcher
  (run_speck.py:177-226 semantics) ──► similarity_matrix.npy + match log

The reference mutates self.qry/self.sum/self.sequence from a samna callback
thread while a matcher thread reads them with no lock (SURVEY.md §3.4 flags
the race); here the pipeline is a single ordered loop over timebins, so the
shared-state race cannot exist by construction.

Event sources:
  - `--event_file file.txt|file.npy`: a recorded DVS stream, integrated at
    EVENT TIME (each event lands in the substep its timestamp falls in)
  - `--event_file -`: LIVE text AER lines on stdin through the native ring
    session (events_native.StreamSession); bins process as they complete
  - otherwise: replay the query traverse's PNG event frames (no timestamps,
    so counts spread evenly over the bin's substeps)

Membranes persist across bins in every source (the chip's network runs
continuously; the collection interval only reads out counts), and a live
dashboard (runtime/visualize.py) serves activity/power/matches unless
--headless.
"""

from __future__ import annotations

import functools
import logging
import os
import time
from collections import deque
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lens_tpu import checker
from lens_tpu.config import LensConfig
from lens_tpu.core.iaf import iaf_step_int
from lens_tpu.core.network import SpikeThresholds
from lens_tpu.data.dataset import FrameDataset, center_pixel_indices
from lens_tpu.ops.seqmatch import online_sequence_conv
from lens_tpu.runtime import events_native
from lens_tpu.runtime.power import PowerMonitor
from lens_tpu.runtime.speck_sim import QuantizedParams, discretize
from lens_tpu.utils import checkpoint
from lens_tpu.utils.loggers import model_logger

# On-chip spike thresholds for the streaming mode (run_speck.py:143-144).
# Note these make a model trained for the default unit thresholds (like the
# bundled example checkpoint) very conservative — the reference's on-chip
# deployments tune firing rates for this regime via the hyperparameter sweep
# (optimizer.py search space).  Sparse output on the example model is the
# faithful behavior, not a simulator fault.
STREAM_THRESHOLDS = SpikeThresholds(inp=1.0, feat=10.0, out=2.0)
QUERIES_PER_SEQUENCE = 4  # run_speck.py:180: average every 4 timebins
SEQUENCE_ROWS = 4  # run_speck.py:200: match once 4 averages collected
SPIKE_FLUSH_BINS = 64  # flush spike_data.npy every N bins (and at stream end)
LIVE_CHUNK_MAX = 8  # live backlog catch-up bound (power-of-two buckets 2/4/8)
# Feeder backpressure bound: a faster-than-realtime producer (e.g.
# `cat recording.txt | ... --event_file -`) must not grow the completed-bin
# ring without limit — each queued bin holds a (substeps, n_in) int32 raster
# plus a (roi, roi) uint32 frame (~130 KB at timebin 250), so 256 bins caps
# the backlog near 32 MB while leaving the drain loop far more headroom than
# it needs (at the measured 27x-realtime drain a full queue clears in ~2.4 s).
# A real-time sensor never approaches this; only pipe replays do.
LIVE_BACKLOG_MAX_BINS = 256


def stream_dot_bound_coeffs(qparams: QuantizedParams) -> Tuple[float, float]:
    """(a, b) such that the worst-case streaming int32 drive for a per-pixel
    per-bin event cap of C is a*C + b.

    Tight worst case (the cap bounds each pixel's total events per bin,
    however they cluster into substeps): layer-1 drive to neuron j
    <= C * sum_i|w1_ij|; its total spikes per bin <= that / thr1 + 1
    (membrane-subtract leaves < thr1 residue), so layer-2 drive to neuron k
    <= sum_j s2_j |w2_jk|.  Both bounds are affine in C, so one coefficient
    pair serves the static config check AND the per-bin runtime guard used
    when no static cap exists (hot filter disabled, or frame replay where
    the AER cap is never applied).
    """
    w1 = np.abs(np.asarray(qparams.w_feat, np.float64))
    w2 = np.abs(np.asarray(qparams.w_out, np.float64))
    d1_j_unit = w1.sum(axis=0)  # layer-1 drive per unit cap
    a1 = float(d1_j_unit.max(initial=0.0))
    thr1 = max(int(qparams.thr_feat), 1)
    a2 = float(((d1_j_unit / thr1) @ w2).max(initial=0.0))
    b2 = float(w2.sum(axis=0).max(initial=0.0))  # the "+1 spike" term
    return max(a1, a2), b2


def check_stream_dot_range(qparams: QuantizedParams, n_in: int, hot_cap: int) -> None:
    """Assert the streaming int32 drives cannot overflow for this config
    (see stream_dot_bound_coeffs for the bound).  Raises with a remediation
    hint if the bound exceeds int32.  Only meaningful when `hot_cap` really
    bounds per-pixel per-bin events — the runtime guard covers the rest.
    """
    a, b = stream_dot_bound_coeffs(qparams)
    bound = a * float(hot_cap) + b
    if bound >= 2**31:
        raise ValueError(
            f"streaming drive bound {bound:.3g} exceeds int32 "
            f"(n_in={n_in}, hot_cap={hot_cap}); "
            "lower --hot_pixel_rate or shorten --timebin"
        )


def substeps_for(timebin_ms: float) -> int:
    """Integration granularity for one bin: one substep per ms (chip-like),
    capped at 1000 — the single source of truth for every consumer (streaming
    loop, live ingest, serving sessions)."""
    return int(min(max(timebin_ms, 1), 1000))


@jax.jit
def stream_forward_counts_carry(
    qparams: QuantizedParams,
    raster: jnp.ndarray,  # (S, n_in) int32 — per-substep input spike counts
    v_feat: jnp.ndarray,  # (n_feat,) int32 membrane carry
    v_out: jnp.ndarray,  # (n_out,) int32 membrane carry
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One bin of quantized streaming forward with PERSISTENT membranes.

    The chip never resets membranes between spike-collection intervals (the
    network runs continuously; run_speck.py:281-299 only *reads out* counts
    per interval), so the streaming loop threads (v_feat, v_out) through this
    function bin after bin.  The input raster is a per-substep count tensor —
    built either by even spreading (frame replay, no timestamps) or by
    event-time rasterization (AER path, rasterize_bin_events).

    Returns (output spike counts (n_out,), new v_feat, new v_out,
    total feature-layer spikes () — the second layer's synop driver for the
    power model: synops = input spikes x fan-out per layer, power.py).

    The layer drives are INT32 dots: per-substep raster counts are bounded
    only by the per-bin hot cap (e.g. 1250 at 250 ms bins) and may all land
    in one substep, so an f32 dot (exact only below 2^24) could silently
    misround on a dense burst over n_in inputs.  These GEMMs are tiny and
    the streaming loop is dispatch-latency-bound, so integer arithmetic
    costs nothing and keeps the chip simulation bit-exact for any input
    within int32 range (guarded by stream_dot_range_ok at setup).
    """
    wf = qparams.w_feat
    wo = qparams.w_out

    def step(carry, x_t):
        v2, v3, acc, feat_total = carry
        h = jnp.dot(x_t, wf, preferred_element_type=jnp.int32)
        v2, s2 = iaf_step_int(v2, h, qparams.thr_feat, qparams.minv_feat)
        h2 = jnp.dot(s2, wo, preferred_element_type=jnp.int32)
        v3, s3 = iaf_step_int(v3, h2, qparams.thr_out, qparams.minv_out)
        return (v2, v3, acc + s3, feat_total + s2.sum()), None

    init = (v_feat, v_out, jnp.zeros_like(v_out), jnp.int32(0))
    (v2, v3, acc, feat_total), _ = jax.lax.scan(step, init, raster)
    return acc, v2, v3, feat_total


@jax.jit
def stream_forward_counts_carry_multi(
    qparams: QuantizedParams,
    rasters: jnp.ndarray,  # (K, S, n_in) int32 — K consecutive bins
    v_feat: jnp.ndarray,  # (n_feat,) int32 membrane carry
    v_out: jnp.ndarray,  # (n_out,) int32
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """K consecutive bins of one stream in ONE device program (outer scan
    over bins, inner scan over substeps) — the recorded-replay fast path.

    Per-bin outputs and the final membrane carry are BIT-IDENTICAL to K
    sequential stream_forward_counts_carry calls (the scan composes the same
    integer recurrence); what changes is dispatch count: on a relay-tunneled
    host each dispatch+fetch is tens of ms while the device compute is ~4 ms,
    so chunking recorded streams lifts the real-time factor by ~K.  The LIVE
    path stays per-bin (a bin must process the moment it completes).

    Returns (counts (K, n_out), v_feat', v_out', feat_totals (K,)).
    """

    def bin_step(carry, raster):
        vf, vo = carry
        counts, vf, vo, feat = stream_forward_counts_carry(qparams, raster, vf, vo)
        return (vf, vo), (counts, feat)

    (v_feat, v_out), (counts, feats) = jax.lax.scan(
        bin_step, (v_feat, v_out), rasters
    )
    return counts, v_feat, v_out, feats


@jax.jit
def stream_forward_counts_carry_batched(
    qparams: QuantizedParams,
    rasters: jnp.ndarray,  # (B, S, n_in) int32 — one bin per stream
    v_feat: jnp.ndarray,  # (B, n_feat) int32
    v_out: jnp.ndarray,  # (B, n_out) int32
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """B concurrent streams advance one bin in ONE device program (fleet
    serving: the per-substep GEMMs batch into (B, n_in) x (n_in, F) MXU
    work instead of B serial dispatches).  Each stream's result is
    bit-identical to the single-stream carry (vmap adds a batch axis to
    elementwise ops and GEMM rows; no reduction is restructured)."""
    return jax.vmap(
        lambda r, vf, vo: stream_forward_counts_carry(qparams, r, vf, vo)
    )(rasters, v_feat, v_out)


def even_spread_raster(counts: np.ndarray, steps: int) -> np.ndarray:
    """(n_in,) per-bin counts -> (steps, n_in) deterministic raster: substep t
    carries floor(c*(t+1)/steps) - floor(c*t/steps) spikes, preserving totals
    exactly.  Used when the source has no event timestamps (frame replay)."""
    c = counts.astype(np.float64)[None, :]
    t = np.arange(steps, dtype=np.float64)[:, None]
    return (np.floor(c * (t + 1.0) / steps) - np.floor(c * t / steps)).astype(
        np.int32
    )


def rasterize_bin_events(
    t_rel: np.ndarray,  # (N,) seconds inside the bin, in [0, timebin_s)
    pix: np.ndarray,  # (N,) flat input-pixel index (already downsampled)
    timebin_s: float,
    substeps: int,
    n_in: int,
    hot_cap: int = 0,
) -> np.ndarray:
    """Event-TIME rasterization of one bin: scatter each event into the
    substep its timestamp falls in (the chip integrates events on arrival,
    run_speck.py:281-299 — unlike even_spread_raster which invents timing).

    hot_cap > 0 applies the per-bin hot-pixel cap keeping the EARLIEST events
    (cumulative clip along the substep axis), matching the rate-filter
    semantics of events_native.hot_pixel_cap.
    """
    raster = np.zeros((substeps, n_in), np.int32)
    if len(t_rel):
        s = np.clip((t_rel / timebin_s * substeps).astype(np.int64), 0, substeps - 1)
        np.add.at(raster, (s, pix.astype(np.int64)), 1)
    if hot_cap > 0:
        cum = np.minimum(np.cumsum(raster, axis=0), hot_cap)
        raster = np.diff(cum, axis=0, prepend=0).astype(np.int32)
    return raster


def center_pixel_lut(roi_dim: int, dims: int) -> np.ndarray:
    """(roi, roi) -> flat input index lookup (-1 = not a sampled pixel)."""
    rows, cols = center_pixel_indices(roi_dim, dims)
    lut = np.full((roi_dim, roi_dim), -1, np.int64)
    for i, r in enumerate(rows):
        for j, c in enumerate(cols):
            lut[r, c] = i * dims + j
    return lut


@functools.partial(jax.jit, static_argnames=("steps", "recips"))
def stream_forward_counts(
    qparams: QuantizedParams,
    counts_in: jnp.ndarray,
    steps: int,
    recips: Tuple[Optional[float], Optional[float]] = (None, None),
) -> jnp.ndarray:
    """Quantized forward for one bin of *event counts* (not intensities).

    The chip integrates events as they arrive; the time-based simulation
    spreads each pixel's per-bin event count evenly over `steps` integer IAF
    steps (deterministic raster: step t carries
    floor(c*(t+1)/steps) - floor(c*t/steps) spikes), preserving total input
    counts exactly.  counts_in: (Q, n_in) int32.  Returns (Q, n_out) int32.

    `recips`: optional host-verified exact reciprocals for the COUNT
    envelope (speck_sim.quantized_recips_for_counts) — bit-identical to the
    default floor-divide, cheaper on the VPU.  The batched AER ingest path
    (ops/events_device.aer_counts_forward) composes this function under one
    jit with the packed-event scatter.
    """
    q, n_in = counts_in.shape
    n_feat = qparams.w_feat.shape[1]
    n_out = qparams.w_out.shape[1]
    # int32 dots for exactness on dense bins — see stream_forward_counts_carry.
    wf = qparams.w_feat
    wo = qparams.w_out
    c = counts_in.astype(jnp.float32)

    def step(carry, t):
        v2, v3, acc = carry
        tf = t.astype(jnp.float32)
        x = (jnp.floor(c * (tf + 1.0) / steps) - jnp.floor(c * tf / steps)).astype(
            jnp.int32
        )
        h = jnp.dot(x, wf, preferred_element_type=jnp.int32)
        v2, s2 = iaf_step_int(
            v2, h, qparams.thr_feat, qparams.minv_feat, recip=recips[0]
        )
        h2 = jnp.dot(s2, wo, preferred_element_type=jnp.int32)
        v3, s3 = iaf_step_int(
            v3, h2, qparams.thr_out, qparams.minv_out, recip=recips[1]
        )
        return (v2, v3, acc + s3), None

    init = (
        jnp.zeros((q, n_feat), jnp.int32),
        jnp.zeros((q, n_out), jnp.int32),
        jnp.zeros((q, n_out), jnp.int32),
    )
    (_, _, acc), _ = jax.lax.scan(step, init, jnp.arange(steps))
    return acc


def frame_source(cfg: LensConfig) -> Tuple[np.ndarray, str]:
    """(F, roi, roi) query-traverse frames + description of the source.
    (Recorded event files take the event-time path — aer_bin_source — which
    preserves per-event timestamps instead of collapsing to frames.)"""
    query_dir = os.path.join(cfg.data_dir, cfg.dataset, cfg.camera, cfg.query)
    ds = FrameDataset.load(
        os.path.join(cfg.data_dir, cfg.query + ".csv"),
        query_dir,
        skip=cfg.filter,
        max_samples=cfg.query_places,
    )
    return ds.frames.astype(np.uint32), f"frame replay {query_dir}"


def load_raw_events(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(t seconds, x, y) from a recorded stream (.npy rows (t,x,y,pol) or text)."""
    if path.endswith(".npy"):
        arr = np.load(path)
        return (
            arr[:, 0].astype(np.float64),
            arr[:, 1].astype(np.int64),
            arr[:, 2].astype(np.int64),
        )
    t, x, y, _, _ = events_native.parse_text_events(path)
    return np.asarray(t, np.float64), np.asarray(x, np.int64), np.asarray(y, np.int64)


def live_aer_bin_source(cfg: LensConfig, line_source, frames_only: bool = False):
    """Per-bin view of live_aer_group_source (the live --collect_data path,
    which writes one PNG per bin and has no use for backlog grouping)."""
    for group in live_aer_group_source(cfg, line_source, frames_only):
        yield from group


def live_aer_group_source(cfg: LensConfig, line_source, frames_only: bool = False):
    """Yield GROUPS (lists) of (raster, roi_frame) bins from a LIVE text
    event feed (e.g. stdin via `--event_file -`): lines of "t x y [pol]" are
    parsed and fed by a PRODUCER THREAD into the native ingest session
    (events_native.StreamSession — the samna source->collection->readout
    graph as a first-party runtime; feed and poll are designed to run on
    different threads, mutex-guarded in both engines).  The consumer side of
    this generator polls the ring: when it keeps up a group is a single bin
    ("processed the moment it completes"); when it falls behind (device
    dispatch in flight, tunnel-load episode) completed bins QUEUE IN THE
    RING — the ingest thread never stalls, exactly like the chip's readout
    (run_speck.py:281-299) — and the backlog comes out as one group so the
    caller can dispatch it through the chunked multi-bin program and catch
    up.  True online operation: the producer and the network never wait for
    end-of-stream.

    `frames_only` (live --collect_data, which discards the raster element):
    a single substep and an all-(-1) LUT make both engines skip the raster
    scatter + cumulative hot-cap work entirely — the frames are unchanged.
    """
    import threading

    if frames_only:
        lut = np.full((cfg.roi_dim, cfg.roi_dim), -1, np.int32)
        substeps = 1
    else:
        lut = center_pixel_lut(cfg.roi_dim, cfg.dims)
        substeps = substeps_for(cfg.timebin)
    sess = events_native.StreamSession(
        cfg.timebin / 1000.0, lut, substeps=substeps,
        roi_origin=cfg.roi_origin, hot_cap=cfg.hot_cap(),
        n_in=cfg.dims * cfg.dims,
    )
    done = threading.Event()
    stop = threading.Event()
    # Guards feed/flush against close: the consumer's finally may close the
    # session while the feeder is blocked on line_source (e.g. a stalled
    # stdin); every session call in the feeder takes this lock and re-checks
    # `stop`, so close (which sets stop, then takes the lock) can never free
    # native state under a call in flight.
    sess_lock = threading.Lock()
    feeder_exc: list = []

    timebin_s = cfg.timebin / 1000.0

    def _feed_arrays(t_a, x_a, y_a) -> bool:
        # Backpressure: when a faster-than-realtime producer (pipe replay)
        # outruns the drain loop, PAUSE ingest instead of queueing completed
        # bins without bound — the pipe buffer then paces the upstream
        # process, exactly like the pre-ring line-loop did implicitly.  The
        # ingest thread still never stalls on a real-time sensor (a live
        # source cannot exceed 1 completed bin per timebin).  Each feed is
        # sliced to ~one timebin of EVENT time so a single large parsed
        # batch (1 MB buffer chunk, sparse-stream line buffer) cannot blow
        # past the cap before the pending() check runs — the queue is thus
        # bounded by LIVE_BACKLOG_MAX_BINS + 2 always.  Slice boundaries
        # are a pacing heuristic only (searchsorted assumes the near-sorted
        # order sensors emit — binning correctness is the session's job and
        # is unaffected by where a feed splits); the per-slice cost (one
        # lock + ctypes feed per bin of event time) is negligible against
        # the drain loop's dispatch rates.
        span = timebin_s
        n = len(t_a)
        start = 0
        while start < n:
            end = (
                int(np.searchsorted(t_a, t_a[start] + span, side="right"))
                if t_a[-1] - t_a[start] > span
                else n
            )
            end = max(end, start + 1)
            with sess_lock:
                if stop.is_set():
                    return False
                sess.feed(t_a[start:end], x_a[start:end], y_a[start:end])
            start = end
            while not stop.is_set():
                with sess_lock:
                    if stop.is_set():
                        return False
                    if sess.pending() <= LIVE_BACKLOG_MAX_BINS:
                        break
                time.sleep(0.005)
        return True

    def _feed_bytes(raw) -> None:
        """Native buffer-parse ingest (the deployment fast path): raw
        chunks go to the C++ line parser (events_native.parse_text_buffer)
        instead of float()-parsing ~3 tokens per line in Python — the
        measured live-loop bottleneck at on-chip densities.  read1 returns
        whatever is available (blocking only when nothing is), and every
        parsed batch feeds immediately, so sparse-stream latency is at
        most one chunk behind arrival — tighter than the line loop's
        50 ms deadline."""
        leftover = b""
        while not stop.is_set():
            chunk = raw.read1(1 << 20)
            if not chunk:
                break  # EOF
            data = leftover + chunk
            t_a, x_a, y_a, used = events_native.parse_text_buffer(data)
            leftover = data[used:]
            if len(t_a) and not _feed_arrays(t_a, x_a, y_a):
                return
        if leftover and not stop.is_set():
            # Trailing line without a newline still counts at EOF.
            t_a, x_a, y_a, _ = events_native.parse_text_buffer(leftover + b"\n")
            if len(t_a) and not _feed_arrays(t_a, x_a, y_a):
                return
        with sess_lock:
            if not stop.is_set():
                sess.flush()

    def _feed_lines() -> None:
        buf_t: list = []
        buf_x: list = []
        buf_y: list = []
        last_feed = time.monotonic()

        def _feed_buf() -> bool:
            ok = _feed_arrays(
                np.asarray(buf_t, np.float64),
                np.asarray(buf_x, np.uint16),
                np.asarray(buf_y, np.uint16),
            )
            buf_t.clear()
            buf_x.clear()
            buf_y.clear()
            return ok

        for line in line_source:
            if stop.is_set():
                return
            parts = line.split()
            ok = len(parts) >= 3  # excludes the "width height" header
            if ok:
                try:
                    tv = float(parts[0])
                    xv = int(float(parts[1]))
                    yv = int(float(parts[2]))
                except ValueError:
                    ok = False
            if ok:
                buf_t.append(tv)
                buf_x.append(xv)
                buf_y.append(yv)
            # Feed on size OR a time deadline, checked for EVERY line —
            # including unparseable ones (heartbeats, comments): a
            # sparse live stream must not sit on completed bins until
            # 4096 events accumulate, and a run of non-event lines must
            # not stall already-buffered events either.
            if buf_t and (
                len(buf_t) >= 4096 or time.monotonic() - last_feed > 0.05
            ):
                if not _feed_buf():
                    return
                last_feed = time.monotonic()
        if buf_t and not _feed_buf():
            return
        with sess_lock:
            if not stop.is_set():
                sess.flush()

    def _feeder() -> None:
        try:
            # The native buffer parser engages for real file-like text
            # sources (sys.stdin exposes its binary layer as .buffer);
            # plain line iterables keep the Python loop.
            raw = getattr(line_source, "buffer", None)
            if (
                raw is not None
                and hasattr(raw, "read1")
                and events_native.has_buffer_parser()
            ):
                _feed_bytes(raw)
            else:
                _feed_lines()
        except Exception as e:  # surfaced on the consumer side
            feeder_exc.append(e)
        finally:
            done.set()

    feeder = threading.Thread(target=_feeder, name="lens-live-feed", daemon=True)
    feeder.start()
    try:
        while True:
            group = []
            while (out := sess.poll()) is not None:
                group.append((out[1], out[0]))
            if group:
                yield group
            elif done.is_set():
                break
            else:
                time.sleep(0.002)  # idle poll cadence; the ring buffers
        # Post-flush drain: bins completed by the final flush.
        group = []
        while (out := sess.poll()) is not None:
            group.append((out[1], out[0]))
        if group:
            yield group
        if feeder_exc:
            raise feeder_exc[0]
    finally:
        stop.set()
        with sess_lock:
            sess.close()


def aer_bin_source(cfg: LensConfig, substeps: int):
    """Yield (raster (substeps, n_in) int32, roi_frame (roi, roi) uint32) per
    timebin from a recorded event stream — the event-TIME integration path.

    Events are ROI-cropped (config roi_x/roi_y; defaults reproduce the chip's
    origin (23,0), run_speck.py:268-271), mapped to the center-pixel
    downsample grid, scattered into the substep their timestamp falls in,
    and hot-pixel-capped (config hot_pixel_rate) keeping the earliest events.
    """
    t, x, y = load_raw_events(cfg.event_file)
    order = np.argsort(t, kind="stable")
    t, x, y = t[order], x[order], y[order]
    roi = cfg.roi_dim
    xr = x - cfg.roi_x
    yr = y - cfg.roi_y
    keep = (xr >= 0) & (xr < roi) & (yr >= 0) & (yr < roi)
    t, xr, yr = t[keep], xr[keep], yr[keep]
    if len(t) == 0:
        return
    timebin_s = cfg.timebin / 1000.0
    t0 = t[0]
    bins = np.floor((t - t0) / timebin_s).astype(np.int64)
    # Corruption guard: one malformed timestamp (e.g. microseconds parsed
    # as seconds, or a near-zero garbage line) would otherwise materialize
    # billions of empty bins below.  ONE shared rule with the batch entry
    # points (events_native.largest_sane_segment, using the streaming
    # engines' gap window): keep the largest contiguous sane run — a
    # corrupt far-FUTURE line sorts to the end, a corrupt far-PAST line to
    # the front, either way the real recording is the big segment.
    lo, hi = events_native.largest_sane_segment(t, timebin_s)
    if (lo, hi) != (0, len(t)):
        logging.getLogger("LENS").warning(
            "event stream: dropping %d events outside the largest sane "
            "segment (corrupt lines?)", len(t) - (hi - lo)
        )
        t, xr, yr = t[lo:hi], xr[lo:hi], yr[lo:hi]
        # Re-anchor the bin grid to the kept segment's first event (the
        # grid was anchored to a possibly-corrupt t0; a no-op when the kept
        # segment is the prefix).
        t0 = float(t[0])
        bins = np.floor((t - t0) / timebin_s).astype(np.int64)
    lut = center_pixel_lut(roi, cfg.dims)
    cap = cfg.hot_cap()
    n_in = cfg.dims * cfg.dims
    n_bins = int(bins.max()) + 1
    # Events are time-sorted, so per-bin slices come from one searchsorted
    # pass — O(n_events + n_bins), not a full-array rescan per bin.
    bounds = np.searchsorted(bins, np.arange(n_bins + 1))
    for b in range(n_bins):
        lo, hi = bounds[b], bounds[b + 1]
        tb, xb, yb = t[lo:hi], xr[lo:hi], yr[lo:hi]
        roi_frame = np.zeros((roi, roi), np.uint32)
        np.add.at(roi_frame, (yb, xb), 1)
        if cap > 0:
            roi_frame = np.minimum(roi_frame, cap).astype(np.uint32)
        pix = lut[yb, xb]
        hit = pix >= 0
        raster = rasterize_bin_events(
            (tb[hit] - t0 - b * timebin_s).astype(np.float64),
            pix[hit],
            timebin_s,
            substeps,
            n_in,
            hot_cap=cap,
        )
        yield raster, roi_frame


class OnlineMatcher:
    """Rolling sequence matcher (run_speck.py:177-226 semantics, race-free).

    Collects per-bin output spike-count vectors; every QUERIES_PER_SEQUENCE
    bins their integer-mean becomes one sequence row; every SEQUENCE_ROWS rows
    it runs the 'same' diagonal convolution, takes the argmax place per
    column, APPENDS the block to similarity_matrix.npy (O(block) IO via
    artifacts.NpyAppender — the full-array rewrite was quadratic over long
    streams), and resets.  In memory only the most recent MATRIX_KEEP_COLS
    columns are retained (`self.matrix`), so RSS stays flat on unbounded
    streams while the on-disk artifact holds everything.

    Preserved reference quirk: the spike accumulator resets only after a FULL
    block (run_speck.py:221 clears self.sum when 4 rows are collected, not per
    row), so row j of a block is the cumulative count over the block's first
    4*j bins divided by 4.
    """

    MATRIX_KEEP_COLS = 4096  # in-memory tail; the .npy artifact is unbounded
    MATCHES_KEEP = 65536  # match-log tail; flat RSS on weeks-long streams

    def __init__(self, n_places: int, sequence_length: int, output_folder: str, logger):
        self.n_places = n_places
        self.L = sequence_length
        self.output_folder = output_folder
        self.logger = logger
        self._bin_sum = np.zeros(n_places, dtype=np.int64)
        self._bins = 0
        self._rows: list = []
        self.matrix: Optional[np.ndarray] = None
        self.matches: list = []  # bounded tail (MATCHES_KEEP); see n_matches_total
        self.n_matches_total = 0  # monotone count, survives tail trimming
        # similarity_matrix.npy stores matrix.T: one (n_places,) row per
        # sequence column, appended block by block.
        from lens_tpu.runtime.artifacts import NpyAppender

        self._matrix_file = NpyAppender(
            os.path.join(output_folder, "similarity_matrix.npy"),
            (n_places,),
            np.float64,
        )

    def push(self, counts: np.ndarray) -> None:
        self._bin_sum += counts.astype(np.int64)
        self._bins += 1
        if self._bins < QUERIES_PER_SEQUENCE:
            return
        self._rows.append(self._bin_sum // QUERIES_PER_SEQUENCE)  # run_speck.py:195
        self._bins = 0  # qry reset (run_speck.py:226); _bin_sum keeps growing
        if len(self._rows) < SEQUENCE_ROWS:
            return
        block = np.stack(self._rows)  # (4, n_places)
        result = online_sequence_conv(block, self.L)  # (n_places, 4)
        argmax_cols = np.argmax(result, axis=0)
        self.logger.info("")
        self.logger.info(r"\\\\\ Place matching result ////")
        for i, a in enumerate(argmax_cols):
            self.logger.info(
                f"The sequence match location for {i} is place number: {a}"
            )
        self.logger.info("")
        self.matches.extend(int(a) for a in argmax_cols)
        self.n_matches_total += len(argmax_cols)
        if len(self.matches) > self.MATCHES_KEEP:
            del self.matches[: len(self.matches) - self.MATCHES_KEEP]
        self.matrix = (
            result
            if self.matrix is None
            else np.concatenate((self.matrix, result), axis=1)[
                :, -self.MATRIX_KEEP_COLS :
            ]
        )
        self._matrix_file.append_rows(np.asarray(result, np.float64).T)
        self._matrix_file.flush()  # valid .npy after every block (crash-durable)
        self._rows = []
        self._bin_sum = np.zeros(self.n_places, dtype=np.int64)  # run_speck.py:221

    def close(self) -> None:
        self._matrix_file.close()


class FullOnlineMatcher:
    """Streaming sequence matcher with OFFLINE-pipeline semantics
    (`--online_matcher full`; a TPU-native extension, no reference
    counterpart).

    The reference's online protocol (run_speck.py:177-226, OnlineMatcher
    above) averages 4-bin blocks and convolves inside a 4-row window, so
    sequence-window taps beyond the block truncate — its accuracy saturates
    near L ≈ 7 while offline SAD keeps improving with L (BENCHMARKS.md,
    matched-L characterization).  This matcher instead emits, per completed
    bin, one column of the offline valid diagonal-mean matrix
    (ops/seqmatch.sequence_conv semantics, run_model.py:248-252): with R
    reference places and window L, bin q >= L-1 completes the query window
    starting at i0 = q-L+1 and yields

        col[j0] = mean_k counts[i0+k, j0+k],   j0 = 0..R-L

    from a rolling buffer of the last L count rows — O(L*R) work and
    O(L*R) state per bin, no growth with stream length.  The on-disk
    artifact (distance_matrix_online.npy, one row per query window) is
    exactly ``sequence_conv(counts, L).T``: a live run gets the full-matrix
    accuracy the offline pipeline measures, match latency = L timebins.
    Logged matches are the argmax j0 (the REFERENCE-WINDOW START index, the
    offline pipeline's matching convention), one per bin after warmup —
    denser than the block protocol's one per 4 bins.
    """

    MATCHES_KEEP = OnlineMatcher.MATCHES_KEEP
    MATRIX_KEEP_COLS = OnlineMatcher.MATRIX_KEEP_COLS
    FLUSH_ROWS = 8  # header re-write cadence (file is valid .npy at flush)

    def __init__(self, n_places: int, sequence_length: int, output_folder: str, logger):
        assert 0 < sequence_length <= n_places, (
            f"sequence_length {sequence_length} exceeds the reference "
            f"traverse ({n_places} places)"
        )
        self.n_places = n_places
        self.L = sequence_length
        self.output_folder = output_folder
        self.logger = logger
        self._window: list = []  # last <=L per-bin count rows (int64)
        self._bin = 0
        self.matches: list = []
        self.n_matches_total = 0
        # In-memory tail of emitted columns.  A deque of (R-L+1,) vectors —
        # appending is O(1) per bin; the block matcher's concatenate-and-trim
        # would copy the whole ~(R, 4096) tail EVERY bin here (one emit per
        # bin vs one per 16).  `matrix` materializes on demand.  Trimmed at
        # push time against MATRIX_KEEP_COLS (not deque maxlen) so the cap
        # stays adjustable per instance.
        self._cols: deque = deque()
        from lens_tpu.runtime.artifacts import NpyAppender

        self._matrix_file = NpyAppender(
            os.path.join(output_folder, "distance_matrix_online.npy"),
            (n_places - sequence_length + 1,),
            np.float64,
        )

    def push(self, counts: np.ndarray) -> None:
        self._window.append(counts.astype(np.int64))
        if len(self._window) < self.L:
            self._bin += 1
            return
        L, R = self.L, self.n_places
        col = np.zeros(R - L + 1, dtype=np.int64)
        for k, row in enumerate(self._window):
            col += row[k : R - L + 1 + k]
        dist = col / float(L)  # float64; exact for int sums
        match = int(np.argmax(dist))
        i0 = self._bin - L + 1  # query-window start this bin completes
        self.logger.info(
            f"The sequence match location for {i0} is place number: {match}"
        )
        self.matches.append(match)
        self.n_matches_total += 1
        if len(self.matches) > self.MATCHES_KEEP:
            del self.matches[: len(self.matches) - self.MATCHES_KEEP]
        self._cols.append(dist)
        while len(self._cols) > self.MATRIX_KEEP_COLS:
            self._cols.popleft()
        self._matrix_file.append(dist)
        if self.n_matches_total % self.FLUSH_ROWS == 0:
            self._matrix_file.flush()
        del self._window[0]
        self._bin += 1

    @property
    def matrix(self) -> Optional[np.ndarray]:
        """(R-L+1, cols) tail of emitted columns (None before first emit)."""
        if not self._cols:
            return None
        return np.stack(tuple(self._cols), axis=1)

    def close(self) -> None:
        self._matrix_file.close()


def make_online_matcher(cfg: LensConfig, output_folder: str, logger):
    """The config's streaming matcher: reference block protocol by default,
    the full-matrix incremental matcher on --online_matcher full."""
    if cfg.online_matcher == "full":
        return FullOnlineMatcher(
            cfg.reference_places, cfg.sequence_length, output_folder, logger
        )
    if cfg.online_matcher == "block":
        return OnlineMatcher(
            cfg.reference_places, cfg.sequence_length, output_folder, logger
        )
    raise ValueError(
        f"unknown --online_matcher {cfg.online_matcher!r} (choices: block, full)"
    )


def run_event_driven(cfg: LensConfig):
    """Full --event_driven mode."""
    checker.check_args(cfg)
    logger, output_folder = model_logger(cfg.output_base)
    params = checkpoint.load_model(cfg.models_dir, cfg.model_name())
    qparams = discretize(params, STREAM_THRESHOLDS, cfg.min_v_mem)
    # Static overflow check only holds when the AER hot cap really bounds
    # per-pixel per-bin events; frame replays never apply it and
    # --hot_pixel_rate 0 disables it — those get a per-bin runtime guard
    # (the bound is affine in the actual per-pixel maximum, computed below).
    static_cap_holds = cfg.hot_cap() > 0 and cfg.event_file != ""
    if static_cap_holds:
        check_stream_dot_range(qparams, cfg.input, cfg.hot_cap())
    bound_a, bound_b = stream_dot_bound_coeffs(qparams)

    rows, cols = center_pixel_indices(cfg.roi_dim, cfg.dims)
    steps = substeps_for(cfg.timebin)

    # Build the bin source BEFORE allocating teardown-requiring resources
    # (dashboard server thread, artifact appenders): a bad source config —
    # e.g. a missing query folder on the frame-replay path — must fail
    # before anything needs the finally-block cleanup, or a long-lived
    # in-process caller leaks a listening server + open fds per failed run.
    live = cfg.event_file == "-"
    live_groups = None
    bins_iter = None
    if live:
        # LIVE ingest: text AER lines arriving on stdin feed the native ring
        # session; bins are processed the moment they complete, and a queued
        # backlog comes out as one group for chunked catch-up dispatch.
        import sys

        live_groups = live_aer_group_source(cfg, sys.stdin)
        logger.info("Streaming LIVE from stdin (event-time integration)")
    elif cfg.event_file:
        # Event-TIME integration: each event lands in the substep its
        # timestamp falls in (chip semantics, run_speck.py:281-299).
        bins_iter = aer_bin_source(cfg, steps)
        logger.info(
            f"Streaming from event stream {cfg.event_file} "
            "(event-time integration)"
        )
    else:
        frames, source_desc = frame_source(cfg)
        logger.info(f"Streaming from {source_desc}: {len(frames)} timebins")
        # The on-chip thresholds (10/2) are tuned for raw DVS stream densities
        # (~1e5 events/s on the reference hardware, run_speck.py logs); bundled
        # PNG replays carry ~100x fewer events per bin, so sparse output spikes
        # there are expected, not a fault.  Feed --event_file with a recorded
        # stream for representative online behavior.
        mean_events = float(frames.sum(dtype=np.float64) / max(len(frames), 1))
        if mean_events < 5_000:
            logger.info(
                f"note: replay density is low ({mean_events:,.0f} events/bin); "
                "on-chip thresholds may yield sparse output spikes"
            )

        def _frame_bins():
            # No timestamps in a frame replay: spread each pixel's count
            # evenly over the bin's substeps (deterministic, total-preserving).
            for frame in frames:
                down = frame[rows][:, cols].astype(np.int64).reshape(-1)
                yield even_spread_raster(down, steps), frame.astype(np.uint32)

        bins_iter = _frame_bins()

    matcher = make_online_matcher(cfg, output_folder, logger)
    power = PowerMonitor()

    # Live view (samnagui equivalent: activity + power rails + match readout,
    # speck2f.py:28-75) unless --headless — the flag actually gates it.
    dashboard = None
    matcher.dashboard_url = None
    if not cfg.headless:
        from lens_tpu.runtime.visualize import LiveDashboard

        dashboard = LiveDashboard()
        matcher.dashboard_url = dashboard.start(
            port=int(os.environ.get("LENS_VIZ_PORT", "0"))
        )
        logger.info(f"Live dashboard: {matcher.dashboard_url}")
    # Appendable spike log: O(bin) IO per bin, flat RSS on unbounded streams
    # (the in-memory list + full np.save rewrite was linear RSS/quadratic IO).
    from lens_tpu.runtime.artifacts import NpyAppender

    spike_file = NpyAppender(
        os.path.join(output_folder, "spike_data.npy"),
        (int(np.asarray(qparams.w_out).shape[1]),),
        np.int32,
    )

    fan_out_feat = int(np.count_nonzero(np.asarray(qparams.w_feat)) / max(cfg.input, 1))
    fan_out_out = int(np.count_nonzero(np.asarray(qparams.w_out)) / max(cfg.feature, 1))

    # Membranes persist across bins: the chip's network runs continuously and
    # the collection interval only reads out counts (run_speck.py:281-299).
    v_feat = jnp.zeros((qparams.w_feat.shape[1],), jnp.int32)
    v_out = jnp.zeros((qparams.w_out.shape[1],), jnp.int32)

    if live:
        # Pre-compile the per-bin program AND every catch-up bucket before
        # the first stdin line is read: a first-occurrence XLA compile
        # mid-stream (minutes through the relay tunnel) would stall the live
        # loop in exactly the backlog situation chunked catch-up exists to
        # absorb.  Zero rasters leave the zero membranes unchanged; results
        # are discarded, so this is a pure cache warm.
        z1 = jnp.zeros((steps, cfg.input), jnp.int32)
        jax.device_get(
            stream_forward_counts_carry(qparams, z1, v_feat, v_out)[0]
        )
        b = 2
        while b <= LIVE_CHUNK_MAX:
            zk = jnp.zeros((b, steps, cfg.input), jnp.int32)
            jax.device_get(
                stream_forward_counts_carry_multi(qparams, zk, v_feat, v_out)[0]
            )
            b *= 2
        logger.info(
            f"Warmed live catch-up programs (1..{LIVE_CHUNK_MAX} bins/dispatch)"
        )

    timebin_s = cfg.timebin / 1000.0

    drained = {"n": 0}  # bins fully persisted (metrics.json ground truth)

    def _process_bin(i, frame, counts, feat_spikes) -> None:
        """Host-side consumers for one completed bin (power model,
        artifacts, matcher, dashboard)."""
        drained["n"] += 1
        n_events = float(frame.sum())
        # synops = input spikes x fan-out per layer (power.py): layer 2's
        # driver is the FEATURE spikes it consumes, not the output spikes.
        n_synops = n_events * fan_out_feat + float(feat_spikes) * fan_out_out
        # Power rates are on the STREAM clock: bin i spans [i, i+1) timebins
        # regardless of how fast the host replays, so power_data.npy is the
        # chip's trace for this recording — deterministic and host-speed
        # independent (the chip processes the stream in real time).
        power.record_bin(n_events, n_synops, timebin_s, t=i * timebin_s)

        logger.info(
            f"Collected {int(counts.sum())} output spikes at time {time.time()}"
        )  # run_speck.py:167 cadence log
        spike_file.append(counts)  # run_speck.py:171-172 artifact
        # Header flush periodically (makes the file a valid .npy of all
        # rows so far); data bytes are already on disk per bin.
        if (i + 1) % SPIKE_FLUSH_BINS == 0:
            spike_file.flush()
        if cfg.save_input:
            ev_dir = os.path.join(output_folder, "events")
            os.makedirs(ev_dir, exist_ok=True)
            np.save(os.path.join(ev_dir, f"bin_{i:05d}_events.npy"), frame)
        n_matches_before = matcher.n_matches_total
        matcher.push(counts)
        if dashboard is not None:
            # Same stream-clock rates record_bin used, so the live rails and
            # the persisted power_data.npy agree bin-for-bin.
            dashboard.update_bin(
                i,
                frame,
                int(counts.sum()),
                power.model.rail_powers(
                    n_events / timebin_s, n_synops / timebin_s
                ),
            )
            new = matcher.n_matches_total - n_matches_before
            if new > 0:  # fresh entries sit at the (possibly trimmed) tail
                dashboard.add_matches(matcher.matches[-new:])

    def _drain(entry) -> None:
        """Fetch one dispatched chunk's results (1..K bins) and process each
        bin in order.  One host fetch for all outputs: every extra fetch is
        a blocking roundtrip per chunk on the relay.  Resumable: `entry`
        tracks how many bins it has already processed, so the crash-path
        re-drain in the finally block continues where an interrupted drain
        stopped instead of duplicating spike rows and matcher pushes."""
        counts_g, feats_g = jax.device_get((entry["counts"], entry["feats"]))
        k_real = entry["k"]
        counts_g = np.atleast_2d(np.asarray(counts_g))[:k_real]
        feats_g = np.atleast_1d(np.asarray(feats_g))[:k_real]
        for j in range(entry["done"], k_real):
            # Marked done BEFORE processing: if a consumer (matcher,
            # dashboard) raises mid-bin, the crash-path re-drain skips the
            # bin rather than appending its spike row twice — at-most-once
            # artifacts (a missing final row is visible; a duplicate would
            # silently corrupt downstream analysis).
            entry["done"] = j + 1
            _process_bin(
                entry["start"] + j, entry["frames"][j], counts_g[j], feats_g[j]
            )

    # Recorded sources may process several bins per dispatch (outer-scan
    # program, bit-identical carry).  The LIVE stdin path is ADAPTIVE: a bin
    # is processed the moment it completes when the loop keeps up, but a
    # backlog of completed bins in the native ring (device stall, tunnel
    # episode) is dispatched together through the same bit-identical chunked
    # program — the catch-up the chip gets for free by never stalling on
    # readout (run_speck.py:281-299).
    chunk = 1 if live else max(int(cfg.stream_chunk_bins), 1)

    def _guard_bin(raster) -> None:
        """Per-bin int32-overflow guard for sources without a static cap:
        the actual per-pixel per-bin event maximum plugs into the affine
        drive bound; a bin that could overflow raises before dispatch."""
        pix_max = float(raster.sum(axis=0, dtype=np.int64).max(initial=0))
        if bound_a * pix_max + bound_b >= 2**31:
            raise ValueError(
                f"streaming drive bound {bound_a * pix_max + bound_b:.3g} "
                f"exceeds int32 (per-pixel bin max {pix_max:.0f}); enable "
                "--hot_pixel_rate or shorten --timebin"
            )

    def _guarded(src):
        for raster, frame in src:
            _guard_bin(raster)
            yield raster, frame

    if not static_cap_holds and bins_iter is not None:
        bins_iter = _guarded(bins_iter)

    def _chunked(src):
        buf = []
        for item in src:
            buf.append(item)
            if len(buf) == chunk:
                yield buf
                buf = []
        if buf:
            yield buf

    if live:

        def _live_grouped(src):
            # Oversized backlogs split into LIVE_CHUNK_MAX slices (compile
            # buckets stay bounded: 1, 2, 4, 8 — all warmed above).
            for group in src:
                # True backlog depth BEFORE slicing — the per-dispatch stat
                # below saturates at LIVE_CHUNK_MAX and cannot distinguish
                # a 9-bin stall from a 400-bin one.
                dispatch_stats["backlog_max"] = max(
                    dispatch_stats["backlog_max"], len(group)
                )
                if not static_cap_holds:
                    for raster, _ in group:
                        _guard_bin(raster)
                for i in range(0, len(group), LIVE_CHUNK_MAX):
                    yield group[i : i + LIVE_CHUNK_MAX]

        groups_iter = _live_grouped(live_groups)
    else:
        groups_iter = _chunked(bins_iter)
    # live catch-up observability: max = largest single dispatch (capped at
    # LIVE_CHUNK_MAX), backlog_max = deepest queue observed, multi = number
    # of multi-bin dispatches.
    dispatch_stats = {"max": 0, "multi": 0, "backlog_max": 0}

    # try/finally: a Ctrl-C or device error mid-stream must still leave the
    # artifacts current (the per-bin save this flush schedule replaced was
    # implicitly crash-durable) and release the dashboard port.
    #
    # ONE-DEEP PIPELINE (recorded sources): chunk i is dispatched (async
    # under JAX), then the host builds chunk i+1's rasters from the source
    # WHILE the device executes, and only then fetches chunk i's results.
    # The membrane carry stays device-resident between dispatches, so
    # chaining adds no extra transfers; host raster building is fully
    # overlapped with execution.  The LIVE path drains synchronously — the
    # contract is "processed the moment the bin completes", and deferring
    # the fetch until the NEXT bin arrives would add a full bin of match
    # latency (indefinite if the sensor stalls).
    pending = None
    t_run_start = time.monotonic()
    try:
        start = 0
        for group in groups_iter:
            k_real = len(group)
            dispatch_stats["max"] = max(dispatch_stats["max"], k_real)
            if k_real > 1:
                dispatch_stats["multi"] += 1
            # Live groups use the smallest warmed power-of-two bucket that
            # fits the backlog; recorded sources always pad to `chunk`.
            bucket = (
                (1 if k_real == 1 else 1 << (k_real - 1).bit_length())
                if live
                else chunk
            )
            if bucket == 1:
                counts_dev, v_feat, v_out, feat_dev = stream_forward_counts_carry(
                    qparams, jnp.asarray(group[0][0]), v_feat, v_out
                )
            else:
                rasters = np.zeros(
                    (bucket,) + group[0][0].shape, np.int32
                )  # zero-raster padding leaves membranes unchanged (v < thr
                # after any reset, so zero drive fires nothing) — one
                # compiled executable per bucket, partial chunks included
                for j, (raster, _) in enumerate(group):
                    rasters[j] = raster
                counts_dev, v_feat, v_out, feat_dev = (
                    stream_forward_counts_carry_multi(
                        qparams, jnp.asarray(rasters), v_feat, v_out
                    )
                )
            entry = {
                "start": start,
                "frames": [frame for _, frame in group],
                "counts": counts_dev,
                "feats": feat_dev,
                "k": k_real,
                "done": 0,
            }
            start += k_real
            if live:
                _drain(entry)
            else:
                if pending is not None:
                    _drain(pending)
                pending = entry
        if pending is not None:
            _drain(pending)
            pending = None
    finally:
        if pending is not None:
            # Crash path: persist the already-dispatched bin if the device
            # can still deliver it; artifact closure must proceed regardless.
            import contextlib

            with contextlib.suppress(Exception):
                _drain(pending)
        if dashboard is not None:
            dashboard.stop()
        spike_file.close()
        matcher.close()
        power.save(os.path.join(output_folder, "power_data.npy"))
        # Machine-readable run summary (the streaming analogue of
        # run_model's metrics.json; inside the finally block so an
        # interrupted stream still leaves its partial tallies).
        import json

        wall = time.monotonic() - t_run_start
        try:
            n_done = drained["n"]  # persisted bins, not just dispatched ones
            summary = {
                "bins_processed": int(n_done),
                "matches_logged": int(matcher.n_matches_total),
                "timebin_ms": cfg.timebin,
                "wall_s": round(wall, 2),
                "bins_per_sec": round(n_done / wall, 2) if wall > 0 else None,
                "realtime_factor": (
                    round(n_done * timebin_s / wall, 2) if wall > 0 else None
                ),
                "mean_power_mw": round(power.mean_total_mw(), 3),
                "source": "live-stdin" if live else (
                    cfg.event_file or "frame-replay"
                ),
                "stream_chunk_bins": chunk,
            }
            if live:
                # Catch-up observability: largest single dispatch (capped
                # at LIVE_CHUNK_MAX), deepest backlog actually observed,
                # and how many dispatches used the chunked program.
                summary["live_dispatch_max_bins"] = dispatch_stats["max"]
                summary["live_backlog_max_bins"] = dispatch_stats["backlog_max"]
                summary["live_multi_dispatches"] = dispatch_stats["multi"]
            with open(os.path.join(output_folder, "metrics.json"), "w") as f:
                json.dump(summary, f, indent=2)
        except OSError:
            pass  # summary must never mask the primary artifacts' close
    logger.info(f"Mean modeled chip power: {power.mean_total_mw():.2f} mW")
    logger.info("")
    logger.info("Successfully completed inferencing using LENS")
    return matcher
