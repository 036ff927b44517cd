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
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "lens_events.cpp"))
_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "liblens_events.so"))

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    lib = ctypes.CDLL(_SO)
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
    lib = get_lib()
    if lib is not None:
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
    n_frames = min(int(bins.max()) + 1 if len(bins) else 0, max_frames)
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
    lib = get_lib()
    if lib is not None:
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
        lib.lens_parse_text_events(
            path.encode(),
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            pol.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, ctypes.byref(w), ctypes.byref(h),
        )
        return t, x, y, pol, (w.value, h.value)
    # numpy fallback
    rows = []
    width = height = 0
    with open(path) as f:
        first = True
        for line in f:
            parts = line.split()
            if first and len(parts) == 2:
                width, height = int(parts[0]), int(parts[1])
                first = False
                continue
            first = False
            if len(parts) >= 4:
                rows.append(
                    (float(parts[0]), int(float(parts[1])), int(float(parts[2])),
                     int(float(parts[3])))
                )
    arr = np.array(rows) if rows else np.zeros((0, 4))
    return (
        arr[:, 0].astype(np.float64),
        arr[:, 1].astype(np.uint16),
        arr[:, 2].astype(np.uint16),
        arr[:, 3].astype(np.uint8),
        (width, height),
    )
