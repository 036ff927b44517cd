"""On-device event-tensor preprocessing.

Device-side complement to the native host engine (native/lens_events.cpp).
The host engine owns *streaming* ingest (variable-length, arrives on host);
this module owns *batched* event tensors that are already device-resident —
e.g. re-binning recorded streams during training-data augmentation — where
the accumulation becomes one fused XLA scatter-add and the hot-pixel cap and
ROI crop fuse into the same program.

Static-shape contract (XLA): the event tensor is fixed-length; invalid or
padding events are marked with x = SENTINEL and scatter to a discard row.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lens_tpu.runtime.events_native import hot_pixel_cap

SENTINEL = jnp.uint16(0xFFFF)


def accumulate_frames_device(
    t: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    t0: jnp.ndarray,
    timebin_s: float,
    n_frames: int,
    roi_x: int = 23,
    roi_y: int = 0,
    roi_w: int = 80,
    roi_h: int = 80,
    hot_thresh: Optional[int] = None,
) -> jnp.ndarray:
    """Device scatter-add accumulation; default hot-pixel cap derives from the
    SAME rate->bin scaling as the host engines (events_native.hot_pixel_cap),
    so both engines produce identical frames for identical defaults.

    Precision: the device program bins in float32 (JAX default), whose
    resolution at epoch-seconds magnitudes (~1.7e9, as real AER dumps carry)
    is ~128 s — hundreds of 250 ms bins would collapse into one.  Host-array
    inputs are therefore rebased to STREAM-RELATIVE time in float64 before
    shipping (where float32 is exact far below the ms bin scale), matching
    the float64 host engines bit-for-bit.  Device-resident inputs must
    already be stream-relative (they are f32, so the damage would predate
    this call)."""
    if hot_thresh is None:
        hot_thresh = hot_pixel_cap(timebin_s)
    if isinstance(t, np.ndarray):
        t = np.asarray(t, np.float64) - np.float64(np.asarray(t0))
        t0 = np.float32(0.0)
    return _accumulate_frames_device(
        t, x, y, t0, timebin_s, n_frames, roi_x, roi_y, roi_w, roi_h, hot_thresh
    )


PACKED_SENTINEL = np.uint32(0xFFFFFFFF)  # padding word: scatters to discard


def pack_center_events(bin_idx: np.ndarray, pix: np.ndarray, n_in: int) -> np.ndarray:
    """Host-side packing of LUT-filtered AER events into one uint32 word per
    event: (bin_idx * n_in + pix).  This is the wire format of the
    AER-sparse ingest path (SURVEY §7's host->device transfer, beaten): at
    on-chip densities only ~1-2% of sensor events hit the center-pixel grid
    (the native ingest engine applies that LUT per event anyway —
    native/lens_events.cpp), so a batch of query bins ships as a few
    hundred KB of packed words instead of MBs of dense uint8 frames."""
    return (
        np.asarray(bin_idx, np.uint32) * np.uint32(n_in)
        + np.asarray(pix, np.uint32)
    )


@functools.partial(jax.jit, static_argnames=("n_bins", "n_in"))
def packed_events_to_counts(
    packed: jnp.ndarray,  # (N,) uint32 words bin*n_in+pix; PACKED_SENTINEL pads
    n_bins: int,
    n_in: int,
) -> jnp.ndarray:
    """Device-side expansion of packed center-pixel events into the
    (n_bins, n_in) int32 count rasters the quantized streaming forward
    consumes — one scatter-add, fusing with the forward when called inside
    the same jit (see aer_counts_forward)."""
    valid = packed != PACKED_SENTINEL
    flat = jnp.where(valid, packed, n_bins * n_in)  # discard row
    counts = jnp.zeros((n_bins * n_in + 1,), jnp.int32).at[flat].add(1)
    return counts[: n_bins * n_in].reshape(n_bins, n_in)


@functools.partial(
    jax.jit, static_argnames=("n_bins", "n_in", "steps", "recips")
)
def aer_counts_forward(
    qparams,  # speck_sim.QuantizedParams
    packed: jnp.ndarray,  # (N,) uint32 packed events
    n_bins: int,
    n_in: int,
    steps: int,
    recips: tuple = (None, None),  # verified multipliers for the COUNT
    # envelope (speck_sim.quantized_recips_for_counts) or None = floor-divide
) -> jnp.ndarray:
    """ONE device program: packed AER words -> scatter-expanded per-bin count
    rasters -> quantized even-spread spiking forward -> (n_bins, n_out)
    counts.  The batched offline analogue of the --event_driven bin loop
    (reference run_model.py:164-227's simulated-speck evaluation, fed by
    events instead of frames); the h2d payload is the packed word list.

    The forward IS runtime/stream.stream_forward_counts (one recurrence
    definition, composed under this jit so scatter + forward fuse into a
    single dispatch) — only the input expansion lives here.
    """
    from lens_tpu.runtime.stream import stream_forward_counts

    counts_in = packed_events_to_counts(packed, n_bins, n_in)
    return stream_forward_counts(qparams, counts_in, steps, recips=recips)


@functools.partial(
    jax.jit,
    static_argnames=("n_frames", "roi_x", "roi_y", "roi_w", "roi_h", "hot_thresh"),
)
def _accumulate_frames_device(
    t: jnp.ndarray,  # (N,) float32 seconds, sorted or not
    x: jnp.ndarray,  # (N,) uint16 sensor coords
    y: jnp.ndarray,  # (N,) uint16
    t0: jnp.ndarray,  # () float32 stream start
    timebin_s: float,
    n_frames: int,
    roi_x: int,
    roi_y: int,
    roi_w: int,
    roi_h: int,
    hot_thresh: int,
) -> jnp.ndarray:
    """(n_frames, roi_h, roi_w) uint32 count frames.

    Same semantics as the native engine's lens_accumulate_frames (ROI origin
    crop per reference run_speck.py:268-271, hot-pixel cap per
    dvs_filter.threshold scaled by bin length): events outside the ROI,
    before t0, beyond the frame budget, or marked with the x=SENTINEL padding
    value are dropped.
    """
    bins = jnp.floor((t - t0) / timebin_s).astype(jnp.int32)
    xr = x.astype(jnp.int32) - roi_x
    yr = y.astype(jnp.int32) - roi_y
    valid = (
        (x != SENTINEL)
        & (t >= t0)
        & (bins >= 0)
        & (bins < n_frames)
        & (xr >= 0)
        & (xr < roi_w)
        & (yr >= 0)
        & (yr < roi_h)
    )
    # Invalid events scatter into a discard frame (index n_frames).
    bins = jnp.where(valid, bins, n_frames)
    flat = bins * (roi_h * roi_w) + jnp.where(valid, yr * roi_w + xr, 0)
    counts = jnp.zeros(((n_frames + 1) * roi_h * roi_w,), jnp.uint32)
    counts = counts.at[flat].add(1)
    frames = counts[: n_frames * roi_h * roi_w].reshape(n_frames, roi_h, roi_w)
    if hot_thresh > 0:
        frames = jnp.minimum(frames, jnp.uint32(hot_thresh))
    return frames
