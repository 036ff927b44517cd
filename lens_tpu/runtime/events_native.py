"""ctypes bindings for the native event-stream engine (native/lens_events.cpp)
with pure-numpy fallbacks.

The .so is built on demand with g++ and cached next to the source; if no
compiler is available the numpy implementations (bit-identical, slower) are
used, so the framework never hard-depends on the toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "lens_events.cpp"))
_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "liblens_events.so"))

_lib: Optional[ctypes.CDLL] = None
_tried = False
_lib_lock = threading.Lock()


def _build() -> bool:
    """Compile to a temp file, then atomically rename into place: a build
    killed mid-write (or two processes racing) must never leave a corrupt
    .so for a later CDLL to choke on."""
    tmp = f"{_SO}.build.{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, _SO)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, OSError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lib_lock:
        return _get_lib_locked()


def _get_lib_locked() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    # Rebuild only when the source is present and newer; a deployment that
    # ships the prebuilt .so without the C++ source must still load it.
    rebuild = not os.path.exists(_SO) or (
        os.path.exists(_SRC) and os.path.getmtime(_SO) < os.path.getmtime(_SRC)
    )
    if rebuild and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        # Corrupt/wrong-arch .so (e.g. copied from another machine): try one
        # clean rebuild, else the numpy fallback serves — the framework
        # never hard-depends on the toolchain.
        if not (os.path.exists(_SRC) and _build()):
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
    u16p = ctypes.POINTER(ctypes.c_uint16)
    lib.lens_accumulate_frames.restype = ctypes.c_int64
    lib.lens_accumulate_frames.argtypes = [
        ctypes.POINTER(ctypes.c_double), u16p, u16p, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
    ]
    lib.lens_decay_frames.restype = ctypes.c_int64
    lib.lens_decay_frames.argtypes = [
        ctypes.POINTER(ctypes.c_double), u16p, u16p, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.lens_find_hot_pixels.restype = ctypes.c_int64
    lib.lens_find_hot_pixels.argtypes = [
        u16p, u16p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_int64, u16p, ctypes.c_int64,
    ]
    lib.lens_parse_text_events.restype = ctypes.c_int64
    lib.lens_parse_text_events.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), u16p, u16p,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    # hasattr guard: a deployment shipping a prebuilt OLDER .so without the
    # C++ source must still load (the buffer parser then falls back to the
    # Python line loop in the live feeder).
    if hasattr(lib, "lens_parse_text_buffer"):
        lib.lens_parse_text_buffer.restype = ctypes.c_int64
        lib.lens_parse_text_buffer.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), u16p, u16p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
    lib.lens_stream_open.restype = ctypes.c_void_p
    lib.lens_stream_open.argtypes = [
        ctypes.c_double, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int64,
    ]
    lib.lens_stream_feed.restype = None
    lib.lens_stream_feed.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double), u16p, u16p,
        ctypes.c_int64,
    ]
    lib.lens_stream_flush.restype = None
    lib.lens_stream_flush.argtypes = [ctypes.c_void_p]
    lib.lens_stream_pending.restype = ctypes.c_int64
    lib.lens_stream_pending.argtypes = [ctypes.c_void_p]
    lib.lens_stream_poll.restype = ctypes.c_int
    lib.lens_stream_poll.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.lens_stream_close.restype = None
    lib.lens_stream_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def _as(arr, dtype):
    return np.ascontiguousarray(arr, dtype=dtype)


HOT_PIXEL_RATE_PER_MS = 5  # chip dvs_filter.threshold (run_speck.py:262-264)


def hot_pixel_cap(timebin_s: float, rate_per_ms: int = HOT_PIXEL_RATE_PER_MS) -> int:
    """Per-bin cap equivalent of the chip's RATE-based defective-pixel filter.

    The chip's `dvs_filter.threshold = 5` (run_speck.py:262-264,
    collect_data.py:234-235) suppresses always-on pixels on a ~per-ms
    timescale; applied to an accumulated bin the threshold must scale with
    the bin length or it clips genuine activity (5 events per 250 ms bin
    would cap normal pixels).  This is the single source of truth for that
    scaling — every accumulation engine (native C++, numpy fallback, device
    scatter-add) derives its default cap here so they agree bin-for-bin.
    """
    return rate_per_ms * max(int(round(timebin_s * 1000.0)), 1)


def accumulate_frames(
    t: np.ndarray,
    x: np.ndarray,
    y: np.ndarray,
    timebin_s: float,
    roi_origin: Tuple[int, int] = (23, 0),
    roi_size: Tuple[int, int] = (80, 80),
    hot_pixel_threshold: Optional[int] = None,
    t0: float = -1.0,
    max_frames: int = 100_000,
) -> np.ndarray:
    """Event stream -> (F, roi_h, roi_w) uint32 count frames with ROI crop and
    hot-pixel cap.  Defaults reproduce the Speck DVS preprocessing config of
    reference run_speck.py:261-271 (origin (23,0), 80x80 cut, rate threshold 5
    scaled to the bin length — see hot_pixel_cap); pass 0 to disable."""
    if hot_pixel_threshold is None:
        hot_pixel_threshold = hot_pixel_cap(timebin_s)
    t = _as(t, np.float64)
    x = _as(x, np.uint16)
    y = _as(y, np.uint16)
    roi_w, roi_h = roi_size
    if len(t) == 0:
        return np.zeros((0, roi_h, roi_w), np.uint32)
    lo, hi = largest_sane_segment(t, timebin_s)
    t, x, y = t[lo:hi], x[lo:hi], y[lo:hi]
    lib = get_lib()
    if lib is not None:
        max_frames = _bound_max_frames(t, t0, timebin_s, max_frames)
        frames = np.zeros((max_frames, roi_h, roi_w), np.uint32)
        n = lib.lens_accumulate_frames(
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            len(t), t0, timebin_s, roi_origin[0], roi_origin[1],
            roi_w, roi_h, hot_pixel_threshold,
            frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), max_frames,
        )
        return frames[:n].copy()
    return _accumulate_frames_np(
        t, x, y, timebin_s, roi_origin, roi_size, hot_pixel_threshold, t0, max_frames
    )


def _bound_max_frames(t, t0, timebin_s, max_frames) -> int:
    """Size the native output buffer from the stream's actual bin span —
    `max_frames` is a safety cap, not a preallocation size (the 100k default
    would commit gigabytes of zeroed frames regardless of stream length:
    ~36 GB for a 346x260 decay run)."""
    start = float(t[0]) if t0 < 0 else float(t0)
    t_max = float(np.max(t))
    span = int(np.floor((t_max - start) / timebin_s)) + 1 if t_max >= start else 1
    return max(1, min(int(max_frames), span))


def largest_sane_segment(t: np.ndarray, timebin_s: float):
    """Indices (lo, hi) of the largest contiguous run of events with no
    inter-event time jump (in EITHER direction — a corrupt mid-array
    timestamp breaks sortedness, so the jump after it is negative) above the
    streaming engines' corruption window (StreamSession.DEFAULT_MAX_GAP_BINS
    — one shared constant, so batch and streaming corruption handling cannot
    desynchronize)."""
    if len(t) < 2:
        return 0, len(t)
    window = StreamSession.DEFAULT_MAX_GAP_BINS * timebin_s
    gaps = np.abs(np.diff(np.asarray(t, np.float64)))
    jumps = np.nonzero(gaps > window)[0]
    if jumps.size == 0:
        return 0, len(t)
    edges = np.concatenate(([0], jumps + 1, [len(t)]))
    seg = int(np.argmax(np.diff(edges)))
    return int(edges[seg]), int(edges[seg + 1])


def _accumulate_frames_np(
    t, x, y, timebin_s, roi_origin, roi_size, hot_thresh, t0, max_frames
) -> np.ndarray:
    if len(t) == 0:
        return np.zeros((0, roi_size[1], roi_size[0]), np.uint32)
    if t0 < 0:
        t0 = float(t[0])
    keep = t >= t0
    t, x, y = t[keep], x[keep], y[keep]
    bins = np.floor((t - t0) / timebin_s).astype(np.int64)
    # Parity with the C++ engine: for n > 0 input events it always emits at
    # least one (possibly all-zero) frame, even when every event precedes t0.
    n_frames = min(max(int(bins.max()) + 1 if len(bins) else 0, 1), max_frames)
    keep = bins < n_frames
    bins, x, y = bins[keep], x[keep], y[keep]
    xr = x.astype(np.int64) - roi_origin[0]
    yr = y.astype(np.int64) - roi_origin[1]
    roi_w, roi_h = roi_size
    inside = (xr >= 0) & (xr < roi_w) & (yr >= 0) & (yr < roi_h)
    bins, xr, yr = bins[inside], xr[inside], yr[inside]
    frames = np.zeros((n_frames, roi_h, roi_w), np.uint32)
    np.add.at(frames, (bins, yr, xr), 1)
    if hot_thresh > 0:
        np.minimum(frames, hot_thresh, out=frames)
    return frames


def decay_frames(
    t: np.ndarray,
    x: np.ndarray,
    y: np.ndarray,
    timebin_s: float,
    decay_lambda: float,
    accum: float,
    width: int,
    height: int,
    t0: float = -1.0,
    max_frames: int = 100_000,
) -> np.ndarray:
    """Exponential-decay frame representation (dvstools.py decay_rep)."""
    t = _as(t, np.float64)
    x = _as(x, np.uint16)
    y = _as(y, np.uint16)
    if len(t) == 0:
        return np.zeros((0, height, width), np.float32)
    lo, hi = largest_sane_segment(t, timebin_s)
    t, x, y = t[lo:hi], x[lo:hi], y[lo:hi]
    lib = get_lib()
    if lib is not None:
        max_frames = _bound_max_frames(t, t0, timebin_s, max_frames)
        frames = np.zeros((max_frames, height, width), np.float32)
        n = lib.lens_decay_frames(
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            len(t), t0, timebin_s, decay_lambda, accum, width, height,
            frames.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_frames,
        )
        return frames[:n].copy()
    return _decay_frames_np(
        t, x, y, timebin_s, decay_lambda, accum, width, height, t0, max_frames
    )


def _decay_frames_np(
    t, x, y, timebin_s, lam, accum, width, height, t0, max_frames
) -> np.ndarray:
    if len(t) == 0:
        return np.zeros((0, height, width), np.float32)
    if t0 < 0:
        t0 = float(t[0])
    state = np.zeros((height, width))
    last = np.full((height, width), t0)
    active = np.zeros((height, width))
    out = []
    frame_end = t0 + timebin_s
    i = 0
    n = len(t)
    while len(out) < max_frames:
        while i < n and t[i] < frame_end:
            if t[i] >= t0 and x[i] < width and y[i] < height:
                p = (int(y[i]), int(x[i]))
                dt = t[i] - last[p]
                active[p] += dt
                state[p] = state[p] * np.exp(-lam * dt) + accum
                last[p] = t[i]
            i += 1
        tail = np.maximum(timebin_s - active, 0.0)
        state = state * np.exp(-lam * tail)
        out.append(state.astype(np.float32).copy())
        active[:] = 0.0
        last[:] = frame_end
        frame_end += timebin_s
        if i >= n:
            break
    return np.stack(out) if out else np.zeros((0, height, width), np.float32)


def find_hot_pixels(
    x: np.ndarray, y: np.ndarray, width: int, height: int, count_threshold: int
) -> np.ndarray:
    """(K, 2) array of (x, y) hot-pixel coordinates."""
    x = _as(x, np.uint16)
    y = _as(y, np.uint16)
    lib = get_lib()
    if lib is not None:
        out = np.zeros((width * height, 2), np.uint16)
        n = lib.lens_find_hot_pixels(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            len(x), width, height, count_threshold,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), len(out),
        )
        return out[:n].copy()
    counts = np.zeros((height, width), np.int64)
    np.add.at(counts, (y.astype(np.int64), x.astype(np.int64)), 1)
    ys, xs = np.where(counts > count_threshold)
    return np.stack([xs, ys], axis=1).astype(np.uint16)


def has_buffer_parser() -> bool:
    """True when the native engine exports the live-ingest buffer parser."""
    lib = get_lib()
    return lib is not None and hasattr(lib, "lens_parse_text_buffer")


def parse_text_buffer(data: bytes):
    """Parse complete 't x y [pol]' lines from a byte buffer — the LIVE
    stdin ingest fast path (the Python per-line float() parse was the live
    loop's measured bottleneck at on-chip densities).  Returns
    (t, x, y, consumed): one event per '\\n'-terminated line with >= 3
    numeric tokens (the header/heartbeat skip rule of the line loop), and
    the byte offset consumed so the caller carries the partial tail line
    into its next chunk.  Requires has_buffer_parser()."""
    lib = get_lib()
    cap = data.count(b"\n")  # <= 1 event per complete line
    t = np.empty(cap, np.float64)
    x = np.empty(cap, np.uint16)
    y = np.empty(cap, np.uint16)
    consumed = ctypes.c_int64()
    n = lib.lens_parse_text_buffer(
        data, len(data),
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        cap, ctypes.byref(consumed),
    )
    n = max(0, min(int(n), cap))
    return t[:n], x[:n], y[:n], int(consumed.value)


def parse_text_events(path: str):
    """Parse 't x y pol' text files (optionally with a 'width height' header,
    the dvstools.py:73-79 format).  Returns (t, x, y, pol, (width, height))."""
    lib = get_lib()
    if lib is not None:
        w = ctypes.c_int()
        h = ctypes.c_int()
        n = lib.lens_parse_text_events(
            path.encode(), None, None, None, None, 0, ctypes.byref(w), ctypes.byref(h)
        )
        if n < 0:
            raise FileNotFoundError(path)
        t = np.zeros(n, np.float64)
        x = np.zeros(n, np.uint16)
        y = np.zeros(n, np.uint16)
        pol = np.zeros(n, np.uint8)
        n2 = lib.lens_parse_text_events(
            path.encode(),
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            pol.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, ctypes.byref(w), ctypes.byref(h),
        )
        # The file may shrink between the count and fill passes (log
        # rotation, a recorder truncating); trust the FILL pass's count or
        # trailing slots stay as phantom zero events.
        n2 = max(0, min(int(n2), n))
        return t[:n2], x[:n2], y[:n2], pol[:n2], (w.value, h.value)
    # numpy fallback
    rows = []
    width = height = 0
    with open(path) as f:
        first = True
        for line in f:
            parts = line.split()
            if first and len(parts) == 2:
                try:
                    # int(float(...)) truncation matches the C++ (int)cast,
                    # so a float-valued header ("128.0 96") parses the same
                    # with or without the toolchain.
                    width, height = int(float(parts[0])), int(float(parts[1]))
                    first = False
                    continue
                except (ValueError, OverflowError):  # inf -> OverflowError
                    pass  # non-numeric/absurd tokens: not a header
            first = False
            if len(parts) >= 4:
                try:
                    rows.append(
                        (float(parts[0]), int(float(parts[1])),
                         int(float(parts[2])), int(float(parts[3])))
                    )
                except (ValueError, OverflowError):
                    continue  # comments/garbage lines skip, like the C++
    arr = np.array(rows) if rows else np.zeros((0, 4))
    return (
        arr[:, 0].astype(np.float64),
        arr[:, 1].astype(np.uint16),
        arr[:, 2].astype(np.uint16),
        arr[:, 3].astype(np.uint8),
        (width, height),
    )


class StreamSession:
    """Live AER ingest session — the samna event-graph role as a first-party
    runtime primitive: a producer feeds time-ordered events as they arrive
    (any thread); the consumer polls complete timebins, each an ROI count
    frame + event-time substep raster over the network's input pixels.

    Bin/substep/cap semantics are bit-identical to the offline batch path
    (runtime/stream.py aer_bin_source); the C++ engine backs it when the
    toolchain is available, with a bit-identical numpy fallback otherwise.
    """

    # Default corruption guard: one malformed AER line with a far-future
    # timestamp must not flood the consumer with empty bins or advance the
    # stream clock past all real events.  Empty-bin runs are O(1) memory
    # either way (stored as counters, synthesized at poll); this bounds how
    # far a single event may jump the clock.  1M bins = ~70 h at 250 ms.
    DEFAULT_MAX_GAP_BINS = 1_000_000
    # Gap-far drops tolerated before concluding t0 was anchored by a corrupt
    # far-past line (mirrors the C++ kFarStreakRebase).
    FAR_STREAK_REBASE = 32

    def __init__(
        self,
        timebin_s: float,
        lut: np.ndarray,  # (roi_h, roi_w) int32: input index or -1
        substeps: int,
        roi_origin: Tuple[int, int] = (23, 0),
        hot_cap: Optional[int] = None,
        n_in: Optional[int] = None,
        use_native: bool = True,
        max_gap_bins: Optional[int] = None,
    ):
        self.timebin_s = float(timebin_s)
        self.roi_x, self.roi_y = roi_origin
        self.roi_h, self.roi_w = lut.shape
        self.substeps = int(substeps)
        self.n_in = int(n_in if n_in is not None else lut.max() + 1)
        self.hot_cap = hot_pixel_cap(timebin_s) if hot_cap is None else int(hot_cap)
        # <= 0 means "no gap guard" — the C++ engine maps it to INT64_MAX
        # (lens_events.cpp lens_stream_open); the fallback must agree, not
        # treat 0 as "drop every event outside the current bin".
        mg = int(self.DEFAULT_MAX_GAP_BINS if max_gap_bins is None else max_gap_bins)
        self.max_gap_bins = mg if mg > 0 else (1 << 62)
        self._lut = np.ascontiguousarray(lut, np.int32)
        self._lib = get_lib() if use_native else None
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.lens_stream_open(
                self.timebin_s, self.roi_x, self.roi_y, self.roi_w, self.roi_h,
                self.hot_cap, self.substeps,
                self._lut.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                self.n_in, self.max_gap_bins,
            )
        else:  # numpy fallback state (same transitions as the C++ struct)
            self._t0 = -1.0
            self._cur_bin = 0
            self._any = False
            self._dirty = False
            self._frame = np.zeros((self.roi_h, self.roi_w), np.uint32)
            self._raster = np.zeros((self.substeps, self.n_in), np.int32)
            # entries: int k = run of k empty bins; tuple = (frame, raster)
            self._ready: list = []
            self._pending = 0
            self._far_streak = 0
            # The API contract is producer feed()/flush() from one thread,
            # consumer poll()/pending() from another (the C++ engine is
            # mutex-guarded); the fallback must be equally safe.
            self._lock = threading.Lock()

    # -- producer side -------------------------------------------------------
    def feed(self, t: np.ndarray, x: np.ndarray, y: np.ndarray) -> None:
        t = _as(t, np.float64)
        x = _as(x, np.uint16)
        y = _as(y, np.uint16)
        if self._handle is not None:
            self._lib.lens_stream_feed(
                self._handle,
                t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                x.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                y.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                len(t),
            )
            return
        with self._lock:
            for i in range(len(t)):
                xr = int(x[i]) - self.roi_x
                yr = int(y[i]) - self.roi_y
                if not (0 <= xr < self.roi_w and 0 <= yr < self.roi_h):
                    continue
                if self._t0 < 0:
                    self._t0 = float(t[i])
                # t0-poisoning guard, mirroring the C++ engine: before any
                # bin has been emitted, an event earlier than t0 by a
                # CORRUPTION-SCALE margin (the max_gap_bins window — ordinary
                # start-of-stream jitter must not discard bin 0's events)
                # rebases the clock (a corrupt far-future FIRST line would
                # otherwise make every real event "late" forever).
                if (
                    self._cur_bin == 0
                    and self._pending == 0
                    and not self._ready
                    and self._t0 - t[i] > self.max_gap_bins * self.timebin_s
                ):
                    self._t0 = float(t[i])
                    self._frame[:] = 0
                    self._raster[:] = 0
                    self._dirty = False
                self._any = True
                b = int(np.floor((t[i] - self._t0) / self.timebin_s))
                in_window = (
                    b >= self._cur_bin
                    and b - self._cur_bin <= self.max_gap_bins
                )
                if not in_window:
                    # Out-of-window in EITHER direction (late, or gap-far
                    # ahead).  A single stray corrupt line produces one such
                    # drop; a poisoned t0 anchor produces an unbroken STREAK
                    # of them — so before the first emitted bin, a long
                    # streak rebases the clock to the current event (the
                    # C++ engine's rule, FAR_STREAK_REBASE).  After a bin
                    # has been emitted the history is fixed: drop.
                    if (
                        self._cur_bin == 0
                        and self._pending == 0
                        and not self._ready
                    ):
                        self._far_streak += 1
                        if self._far_streak >= self.FAR_STREAK_REBASE:
                            self._t0 = float(t[i])
                            self._frame[:] = 0
                            self._raster[:] = 0
                            self._dirty = False
                            self._far_streak = 0
                            b = 0
                        else:
                            continue
                    else:
                        continue
                else:
                    self._far_streak = 0  # in-window event: the anchor is sane
                while self._cur_bin < b:
                    self._close_bin()
                self._dirty = True
                self._frame[yr, xr] += 1
                pix = int(self._lut[yr, xr])
                if pix >= 0:
                    t_rel = float(t[i]) - self._t0 - b * self.timebin_s
                    s = min(max(int(t_rel / self.timebin_s * self.substeps), 0),
                            self.substeps - 1)
                    self._raster[s, pix] += 1

    def flush(self) -> None:
        """Close the current (partial) bin — call at end of stream.
        Idempotent: a defensive second flush emits no spurious empty bin."""
        if self._handle is not None:
            self._lib.lens_stream_flush(self._handle)
            return
        with self._lock:
            if self._any:
                self._close_bin()
            self._any = False

    # -- consumer side -------------------------------------------------------
    def pending(self) -> int:
        if self._handle is not None:
            return int(self._lib.lens_stream_pending(self._handle))
        with self._lock:
            return self._pending

    def poll(self) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """(frame (roi_h, roi_w) uint32, raster (substeps, n_in) int32) for
        the next complete bin, or None if no bin is ready yet."""
        if self._handle is not None:
            frame = np.zeros((self.roi_h, self.roi_w), np.uint32)
            raster = np.zeros((self.substeps, self.n_in), np.int32)
            got = self._lib.lens_stream_poll(
                self._handle,
                frame.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                raster.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            return (frame, raster) if got else None
        with self._lock:
            if not self._ready:
                return None
            head = self._ready[0]
            self._pending -= 1
            if isinstance(head, int):  # run of empty bins, synthesized lazily
                if head == 1:
                    self._ready.pop(0)
                else:
                    self._ready[0] = head - 1
                return (
                    np.zeros((self.roi_h, self.roi_w), np.uint32),
                    np.zeros((self.substeps, self.n_in), np.int32),
                )
            return self._ready.pop(0)

    def _close_bin(self) -> None:
        self._pending += 1
        self._cur_bin += 1
        if not self._dirty:  # empty bin: extend/append a run counter
            if self._ready and isinstance(self._ready[-1], int):
                self._ready[-1] += 1
            else:
                self._ready.append(1)
            return
        if self.hot_cap > 0:
            frame = np.minimum(self._frame, self.hot_cap).astype(np.uint32)
            cum = np.minimum(np.cumsum(self._raster, axis=0), self.hot_cap)
            raster = np.diff(cum, axis=0, prepend=0).astype(np.int32)
        else:  # hot_cap <= 0 disables the filter (same as the C++ engine
            # and accumulate_frames; hot_cap=0 must not zero every bin)
            frame = self._frame.astype(np.uint32).copy()
            raster = self._raster.copy()
        self._ready.append((frame, raster))
        self._frame[:] = 0
        self._raster[:] = 0
        self._dirty = False

    def close(self) -> None:
        if self._handle is not None:
            self._lib.lens_stream_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
