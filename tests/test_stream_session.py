"""Native live-ingest session: parity with the offline AER path, native vs
numpy-fallback agreement, cross-thread feed/poll, and the live stdin mode."""

import threading
from dataclasses import replace

import numpy as np
import pytest

from lens_tpu.runtime import events_native as ev
from lens_tpu.runtime.stream import aer_bin_source, center_pixel_lut, live_aer_bin_source


def _random_stream(rng, n=8000, t_span=2.3, sensor=128):
    t = np.sort(rng.uniform(0, t_span, n))
    x = rng.integers(0, sensor, n).astype(np.uint16)
    y = rng.integers(0, sensor, n).astype(np.uint16)
    return t, x, y


def _drain(sess):
    out = []
    while (b := sess.poll()) is not None:
        out.append(b)
    return out


@pytest.mark.parametrize("use_native", [True, False])
def test_session_matches_offline_batch_path(tmp_path, use_native, tiny_dataset_cfg):
    """Feeding a recorded stream through the live session in random-size
    chunks must reproduce the offline aer_bin_source bins BIT-FOR-BIT
    (same t0, bin, substep, and earliest-kept cap semantics)."""
    if use_native and ev.get_lib() is None:
        pytest.skip("native engine unavailable")
    rng = np.random.default_rng(0)
    t, x, y = _random_stream(rng)
    cfg = replace(tiny_dataset_cfg)  # roi 16, dims 4, timebin from conftest
    ev_path = tmp_path / "stream.npy"
    np.save(ev_path, np.stack([t, x, y, np.ones_like(t)], axis=1))
    offline = list(aer_bin_source(replace(cfg, event_file=str(ev_path)),
                                  int(min(max(cfg.timebin, 1), 1000))))

    lut = center_pixel_lut(cfg.roi_dim, cfg.dims)
    sess = ev.StreamSession(
        cfg.timebin / 1000.0, lut, substeps=int(min(max(cfg.timebin, 1), 1000)),
        roi_origin=(23, 0), n_in=cfg.dims * cfg.dims, use_native=use_native,
    )
    i = 0
    while i < len(t):
        step = int(rng.integers(1, 700))
        sess.feed(t[i : i + step], x[i : i + step], y[i : i + step])
        i += step
    sess.flush()
    live = _drain(sess)
    sess.close()

    assert len(live) == len(offline) > 0
    for (frame, raster), (off_raster, off_frame) in zip(live, offline):
        np.testing.assert_array_equal(frame, off_frame)
        np.testing.assert_array_equal(raster, off_raster)


def test_native_and_fallback_agree():
    if ev.get_lib() is None:
        pytest.skip("native engine unavailable")
    rng = np.random.default_rng(1)
    t, x, y = _random_stream(rng, n=3000, t_span=1.1)
    lut = center_pixel_lut(80, 10)
    out = {}
    for use_native in (True, False):
        sess = ev.StreamSession(0.25, lut, substeps=250, use_native=use_native)
        sess.feed(t, x, y)
        sess.flush()
        out[use_native] = _drain(sess)
        sess.close()
    assert len(out[True]) == len(out[False]) > 0
    for (f1, r1), (f2, r2) in zip(out[True], out[False]):
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_array_equal(r1, r2)


def test_cross_thread_feed_poll():
    """Producer thread feeds while the consumer polls — the ingest session is
    the component that replaces the reference's unsynchronized samna-callback
    threads (SURVEY §3.4 race) with a locked ring."""
    rng = np.random.default_rng(2)
    t, x, y = _random_stream(rng, n=20_000, t_span=5.0)
    lut = center_pixel_lut(80, 10)
    sess = ev.StreamSession(0.25, lut, substeps=250)

    def produce():
        for i in range(0, len(t), 500):
            sess.feed(t[i : i + 500], x[i : i + 500], y[i : i + 500])
        sess.flush()

    prod = threading.Thread(target=produce)
    prod.start()
    bins = []
    while prod.is_alive() or sess.pending():
        b = sess.poll()
        if b is not None:
            bins.append(b)
    prod.join()
    bins.extend(_drain(sess))
    sess.close()
    assert len(bins) == 20  # 5.0 s / 0.25 s
    total = sum(int(f.sum()) for f, _ in bins)
    # every in-ROI event accounted for (cap can only reduce, check bound)
    xr, yr = x.astype(int) - 23, y.astype(int)
    in_roi = ((xr >= 0) & (xr < 80) & (yr >= 0) & (yr < 80)).sum()
    assert 0 < total <= in_roi


@pytest.mark.parametrize("use_native", [True, False])
def test_empty_bin_runs_are_lazy_and_complete(use_native):
    """A long quiet gap between events must not materialize per-bin buffers
    eagerly (a far-future event used to pack every intervening empty bin's
    ~substeps*n_in*4 bytes before the consumer could poll); the gap is stored
    as a run counter and synthesized as zero bins at poll time."""
    if use_native and ev.get_lib() is None:
        pytest.skip("native engine unavailable")
    lut = center_pixel_lut(80, 10)
    gap_bins = 5000  # 5000 eagerly-packed bins would be ~0.5 GB at these shapes
    sess = ev.StreamSession(0.25, lut, substeps=250, use_native=use_native)
    sess.feed(np.array([0.0]), np.array([30], np.uint16), np.array([5], np.uint16))
    sess.feed(
        np.array([gap_bins * 0.25 + 0.01]),
        np.array([40], np.uint16),
        np.array([6], np.uint16),
    )
    sess.flush()
    assert sess.pending() == gap_bins + 1
    first = sess.poll()
    assert first[0].sum() == 1  # bin 0 carries the first event
    for _ in range(gap_bins - 1):
        frame, raster = sess.poll()
        assert frame.sum() == 0 and raster.sum() == 0
    last = sess.poll()
    assert last[0].sum() == 1  # final bin carries the second event
    assert sess.poll() is None
    sess.close()


@pytest.mark.parametrize("use_native", [True, False])
def test_corrupt_far_future_event_dropped(use_native):
    """One malformed AER line with a timestamp beyond max_gap_bins is dropped:
    it must not advance the stream clock (which would discard every subsequent
    real event as 'late') or enqueue a flood of empty bins."""
    if use_native and ev.get_lib() is None:
        pytest.skip("native engine unavailable")
    lut = center_pixel_lut(80, 10)
    sess = ev.StreamSession(
        0.25, lut, substeps=250, use_native=use_native, max_gap_bins=100
    )
    x = np.array([30], np.uint16)
    y = np.array([5], np.uint16)
    sess.feed(np.array([0.0]), x, y)
    sess.feed(np.array([1e12]), x, y)  # corrupt line: ~4e12 bins ahead
    sess.feed(np.array([0.1]), x, y)  # real traffic continues in bin 0
    sess.feed(np.array([0.3]), x, y)  # and bin 1
    sess.flush()
    assert sess.pending() == 2
    f0, _ = sess.poll()
    f1, _ = sess.poll()
    assert f0.sum() == 2 and f1.sum() == 1
    sess.close()


def test_hot_cap_zero_disables_filter_both_engines():
    """hot_cap=0 means 'cap disabled' (matching accumulate_frames and the C++
    engine); the numpy fallback used to clamp every frame/raster to zero."""
    rng = np.random.default_rng(7)
    t, x, y = _random_stream(rng, n=2000, t_span=0.9)
    lut = center_pixel_lut(80, 10)
    out = {}
    engines = [False] + ([True] if ev.get_lib() is not None else [])
    for use_native in engines:
        sess = ev.StreamSession(
            0.25, lut, substeps=250, hot_cap=0, use_native=use_native
        )
        sess.feed(t, x, y)
        sess.flush()
        out[use_native] = _drain(sess)
        sess.close()
    # Uncapped totals equal the raw in-ROI event count.
    xr, yr = x.astype(int) - 23, y.astype(int)
    in_roi = int(((xr >= 0) & (xr < 80) & (yr >= 0) & (yr < 80)).sum())
    for bins in out.values():
        assert sum(int(f.sum()) for f, _ in bins) == in_roi
    if True in out:
        for (f1, r1), (f2, r2) in zip(out[True], out[False]):
            np.testing.assert_array_equal(f1, f2)
            np.testing.assert_array_equal(r1, r2)


def test_stream_dot_range_guard():
    """The int32-drive bound raises with a remediation hint when a config's
    worst-case dense burst could overflow the streaming integer dots."""
    from lens_tpu.core.network import LensParams
    from lens_tpu.runtime.speck_sim import discretize
    from lens_tpu.runtime.stream import STREAM_THRESHOLDS, check_stream_dot_range

    rng = np.random.default_rng(11)
    params = LensParams(
        w_feat=rng.normal(size=(100, 200)).astype(np.float32),
        w_out=rng.normal(size=(200, 100)).astype(np.float32),
        thr_feat=np.ones(200, np.float32),
        thr_out=np.ones(100, np.float32),
    )
    qp = discretize(params, STREAM_THRESHOLDS, -1.0)
    check_stream_dot_range(qp, n_in=100, hot_cap=1250)  # default config: fine
    with pytest.raises(ValueError, match="hot_pixel_rate"):
        check_stream_dot_range(qp, n_in=1_000_000, hot_cap=1_000_000)


def test_live_stdin_mode_end_to_end(tiny_dataset_cfg):
    """--event_file - : text AER lines through live_aer_bin_source match the
    batch path on the same data."""
    rng = np.random.default_rng(3)
    cfg = tiny_dataset_cfg
    t, x, y = _random_stream(rng, n=4000, t_span=1.7, sensor=64)
    lines = ["64 64\n"] + [
        f"{tv:.6f} {xv} {yv} 1\n" for tv, xv, yv in zip(t, x, y)
    ]
    live = list(live_aer_bin_source(cfg, iter(lines)))
    assert len(live) > 0
    steps = int(min(max(cfg.timebin, 1), 1000))
    lut = center_pixel_lut(cfg.roi_dim, cfg.dims)
    sess = ev.StreamSession(
        cfg.timebin / 1000.0, lut, substeps=steps, n_in=cfg.dims * cfg.dims
    )
    # Feed with float re-parse to match the text roundtrip precision.
    t_txt = np.array([float(f"{tv:.6f}") for tv in t])
    sess.feed(t_txt, x, y)
    sess.flush()
    ref = _drain(sess)
    sess.close()
    assert len(live) == len(ref)
    for (raster, frame), (rf, rr) in zip(live, ref):
        np.testing.assert_array_equal(frame, rf)
        np.testing.assert_array_equal(raster, rr)


def test_live_frames_only_mode_same_frames():
    """Collection's frames_only live source must yield the same frames as
    the full session (it only skips the raster work the collector discards)."""
    from dataclasses import replace

    import io

    from lens_tpu.config import LensConfig
    from lens_tpu.runtime.stream import live_aer_bin_source

    cfg = LensConfig(dims=10, roi_dim=80, timebin=100)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(400):
        t = i * 0.002
        x = int(rng.integers(cfg.roi_x, cfg.roi_x + 80))
        y = int(rng.integers(cfg.roi_y, cfg.roi_y + 80))
        lines.append(f"{t} {x} {y} 1\n")
    text = "".join(lines)
    full = list(live_aer_bin_source(cfg, io.StringIO(text)))
    fonly = list(live_aer_bin_source(cfg, io.StringIO(text), frames_only=True))
    assert len(full) == len(fonly) > 0
    for (_, f1), (r2, f2) in zip(full, fonly):
        np.testing.assert_array_equal(f1, f2)
        assert r2.shape[0] == 1  # single substep: raster work skipped


def test_live_pipe_replay_backpressure_bounds_backlog(monkeypatch):
    """A faster-than-realtime producer (pipe replay) must NOT grow the
    completed-bin ring without bound: the feeder pauses once
    LIVE_BACKLOG_MAX_BINS bins are queued, so even a deliberately slow
    consumer never drains a backlog much deeper than the cap (the pipe
    buffer then paces the upstream process).  Regression test for the
    unbounded-ingest review finding."""
    import time

    from lens_tpu import config as _cfg_mod
    from lens_tpu.config import LensConfig
    from lens_tpu.runtime import stream as stream_mod
    from lens_tpu.runtime.stream import live_aer_group_source

    cap = 8
    monkeypatch.setattr(stream_mod, "LIVE_BACKLOG_MAX_BINS", cap)
    cfg = LensConfig(dims=10, roi_dim=80, timebin=50)
    rng = np.random.default_rng(7)
    # 120 bins' worth of events, delivered instantly (in-memory iterable =
    # an infinitely fast pipe).
    lines = []
    for i in range(120 * 5):
        t = i * 0.01
        x = int(rng.integers(cfg.roi_x, cfg.roi_x + 80))
        y = int(rng.integers(cfg.roi_y, cfg.roi_y + 80))
        lines.append(f"{t:.4f} {x} {y} 1\n")
    max_group = 0
    n_bins = 0
    for group in live_aer_group_source(cfg, iter(lines)):
        max_group = max(max_group, len(group))
        n_bins += len(group)
        time.sleep(0.02)  # slow consumer: forces the backlog to the cap
    # Every bin still arrives exactly once...
    assert n_bins >= 118
    # ...but the drained backlog stays near the cap (slack: bins completed
    # while a drain is in flight), instead of the whole 120-bin stream.
    assert max_group <= cap + 4, max_group
