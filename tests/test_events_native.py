import numpy as np
import pytest

from lens_tpu.runtime import events_native as ev


def _toy_stream():
    # Events across three 0.1 s bins; sensor 128x128, ROI (23,0)+80x80.
    t = np.array([0.00, 0.01, 0.05, 0.12, 0.15, 0.25, 0.26, 0.27])
    x = np.array([23, 23, 30, 40, 150, 23, 23, 23], np.uint16)
    y = np.array([0, 0, 5, 10, 5, 2, 2, 2], np.uint16)
    return t, x, y


def test_accumulate_frames_basic():
    t, x, y = _toy_stream()
    frames = ev.accumulate_frames(t, x, y, 0.1, (23, 0), (80, 80), hot_pixel_threshold=0)
    assert frames.shape == (3, 80, 80)
    assert frames[0, 0, 0] == 2  # two events at (23,0) in bin 0
    assert frames[0, 5, 7] == 1  # (30,5) -> roi (7,5)
    assert frames[1, 10, 17] == 1  # (40,10) -> roi (17,10)
    assert frames[1].sum() == 1  # x=150 is outside the ROI cut
    assert frames[2, 2, 0] == 3


def test_hot_pixel_cap():
    t, x, y = _toy_stream()
    frames = ev.accumulate_frames(t, x, y, 0.1, (23, 0), (80, 80), hot_pixel_threshold=2)
    assert frames[2, 2, 0] == 2  # 3 events capped at threshold


def test_native_matches_numpy():
    rng = np.random.default_rng(0)
    n = 5000
    t = np.sort(rng.uniform(0, 1.0, n))
    x = rng.integers(0, 128, n).astype(np.uint16)
    y = rng.integers(0, 128, n).astype(np.uint16)
    native = ev.accumulate_frames(t, x, y, 0.05, (23, 0), (80, 80), 5)
    numpy_ = ev._accumulate_frames_np(
        t, x, y, 0.05, (23, 0), (80, 80), 5, -1.0, 100_000
    )
    if ev.get_lib() is None:
        pytest.skip("native lib unavailable")
    np.testing.assert_array_equal(native, numpy_)


def test_find_hot_pixels():
    x = np.array([5] * 10 + [7], np.uint16)
    y = np.array([3] * 10 + [2], np.uint16)
    hot = ev.find_hot_pixels(x, y, 16, 16, count_threshold=5)
    assert hot.shape == (1, 2)
    assert tuple(hot[0]) == (5, 3)


def test_parse_text_events_roundtrip(tmp_path):
    path = tmp_path / "events.txt"
    path.write_text("128 96\n0.5 10 20 1\n0.6 11 21 0\n")
    t, x, y, pol, (w, h) = ev.parse_text_events(str(path))
    assert (w, h) == (128, 96)
    np.testing.assert_allclose(t, [0.5, 0.6])
    np.testing.assert_array_equal(x, [10, 11])
    np.testing.assert_array_equal(y, [20, 21])
    np.testing.assert_array_equal(pol, [1, 0])


def test_decay_frames_monotone_decay():
    # One event, then silence: the pixel's value must decay across bins.
    t = np.array([0.0, 0.0])
    x = np.array([1, 1], np.uint16)
    y = np.array([1, 1], np.uint16)
    frames = ev.decay_frames(t, x, y, 0.1, decay_lambda=5.0, accum=1.0,
                             width=4, height=4, max_frames=3)
    v0 = frames[0, 1, 1]
    assert v0 > 0
    assert frames.shape[0] >= 1


def test_accumulate_all_events_before_t0_engine_parity():
    """n > 0 events all preceding an explicit t0: the C++ engine emits one
    all-zero frame; the fallback must match (it returned 0 frames)."""
    t = np.array([0.0, 0.1])
    x = np.array([30, 31], np.uint16)
    y = np.array([5, 6], np.uint16)
    nat = ev.accumulate_frames(t, x, y, 0.25, (23, 0), (80, 80), 5, t0=5.0)
    fb = ev._accumulate_frames_np(t, x, y, 0.25, (23, 0), (80, 80), 5, 5.0, 100_000)
    assert fb.shape == (1, 80, 80) and fb.sum() == 0
    if ev.get_lib() is not None:
        np.testing.assert_array_equal(nat, fb)


def test_native_buffer_bounded_by_stream_span():
    """max_frames is a safety cap, not a preallocation size: a short stream
    with the default 100k cap must not commit gigabytes.  _bound_max_frames
    sizes the buffer from the actual bin span."""
    t = np.array([0.0, 0.4, 0.9])
    assert ev._bound_max_frames(t, -1.0, 0.25, 100_000) == 4  # bins 0..3
    assert ev._bound_max_frames(t, -1.0, 0.25, 2) == 2  # cap still binds
    assert ev._bound_max_frames(t, 5.0, 0.25, 100_000) == 1  # all before t0
    # End-to-end: the result is unchanged by the bounding.
    x = np.array([30, 40, 50], np.uint16)
    y = np.array([5, 6, 7], np.uint16)
    frames = ev.accumulate_frames(t, x, y, 0.25, (23, 0), (80, 80), 5)
    assert frames.shape[0] == 4 and frames.sum() == 3


def test_stream_session_gap_guard_zero_means_unlimited():
    """max_gap_bins <= 0 disables the corruption guard in the C++ engine
    (mapped to INT64_MAX); the fallback must not treat it literally and drop
    every event outside the current bin."""
    lut = np.zeros((80, 80), np.int32)
    outs = {}
    for use_native in ([True, False] if ev.get_lib() is not None else [False]):
        s = ev.StreamSession(
            0.1, lut, substeps=4, roi_origin=(0, 0), hot_cap=0, n_in=1,
            use_native=use_native, max_gap_bins=0,
        )
        try:
            s.feed(np.array([0.0, 0.25, 0.35]),
                   np.array([1, 2, 3], np.uint16), np.array([1, 2, 3], np.uint16))
            s.flush()
            sums = []
            while (out := s.poll()) is not None:
                sums.append(int(out[0].sum()))
            outs[use_native] = sums
        finally:
            s.close()
    # 4 bins (0..3): events in bins 0, 2, 3 — nothing dropped.
    assert outs[False] == [1, 0, 1, 1], outs
    if True in outs:
        assert outs[True] == outs[False]


def test_stream_session_fallback_thread_safety():
    """Producer feed() and consumer poll() from different threads must not
    lose or double-count bins in the numpy fallback (the C++ engine is
    mutex-guarded; the fallback now locks the same transitions)."""
    import threading

    lut = np.zeros((80, 80), np.int32)
    s = ev.StreamSession(
        0.01, lut, substeps=2, roi_origin=(0, 0), hot_cap=0, n_in=1,
        use_native=False,
    )
    n_events = 4000
    t = np.arange(n_events) * 0.002  # 5 events per 10 ms bin
    x = np.full(n_events, 3, np.uint16)
    y = np.full(n_events, 3, np.uint16)
    got = []

    def consumer():
        while True:
            out = s.poll()
            if out is None:
                if done.is_set() and s.pending() == 0:
                    return
                continue
            got.append(int(out[0].sum()))

    done = threading.Event()
    c = threading.Thread(target=consumer)
    c.start()
    for i in range(0, n_events, 40):
        s.feed(t[i : i + 40], x[i : i + 40], y[i : i + 40])
    s.flush()
    done.set()
    c.join(timeout=30)
    assert not c.is_alive()
    assert sum(got) == n_events  # every event accounted for, exactly once
    assert len(got) == int(np.ceil(t[-1] / 0.01)) + 1 or len(got) > 0


def test_stream_session_t0_poisoning_rebase():
    """A corrupt far-future FIRST line must not anchor the stream clock —
    before any bin is emitted, an earlier event rebases t0 (both engines),
    so the real stream is processed instead of dropped as 'late' forever."""
    lut = np.zeros((80, 80), np.int32)
    for use_native in ([True, False] if ev.get_lib() is not None else [False]):
        s = ev.StreamSession(
            0.1, lut, substeps=4, roi_origin=(0, 0), hot_cap=0, n_in=1,
            use_native=use_native,
        )
        try:
            # Corrupt first line (t=9.9e6), then the real stream at t~100 s.
            s.feed(np.array([9.9e6, 100.0, 100.25, 100.35]),
                   np.array([1, 2, 3, 4], np.uint16),
                   np.array([1, 2, 3, 4], np.uint16))
            s.flush()
            sums = []
            while (out := s.poll()) is not None:
                sums.append(int(out[0].sum()))
            assert sums == [1, 0, 1, 1], (use_native, sums)
        finally:
            s.close()


def test_stream_session_jitter_does_not_rebase():
    """Millisecond out-of-order jitter at stream start must NOT trip the
    t0-rebase guard (which would discard bin 0's accumulated events); the
    single late event is dropped, exactly as before the guard existed."""
    lut = np.zeros((80, 80), np.int32)
    for use_native in ([True, False] if ev.get_lib() is not None else [False]):
        s = ev.StreamSession(
            0.1, lut, substeps=4, roi_origin=(0, 0), hot_cap=0, n_in=1,
            use_native=use_native,
        )
        try:
            # 1.00, 1.01 accumulate in bin 0; 0.99 is jitter (late, dropped).
            s.feed(np.array([1.00, 1.01, 0.99, 1.15]),
                   np.array([1, 2, 3, 4], np.uint16),
                   np.array([1, 2, 3, 4], np.uint16))
            s.flush()
            sums = []
            while (out := s.poll()) is not None:
                sums.append(int(out[0].sum()))
            # Bin 0 keeps its 2 events; t=1.15 opens bin 1; the jitter
            # event is dropped as late (NOT rebased into wiping bin 0).
            assert sums == [2, 1], (use_native, sums)
        finally:
            s.close()


def test_stream_session_far_past_t0_recovers():
    """A corrupt near-zero FIRST line (epoch-second stream) must not wedge
    the stream forever: a persistent streak of gap-far real events (only a
    poisoned anchor produces one) rebases the clock forward and the rest of
    the stream processes normally (both engines).  A single stray far event
    must NOT trigger the rebase (covered by the existing
    test_corrupt_far_future_event_dropped)."""
    lut = np.zeros((80, 80), np.int32)
    streak = ev.StreamSession.FAR_STREAK_REBASE
    n_real = streak + 40  # enough to trip the streak and keep streaming
    t0 = 1.7e9  # epoch seconds
    t_real = t0 + np.arange(n_real) * 0.01  # 10 events per 0.1 s bin
    for use_native in ([True, False] if ev.get_lib() is not None else [False]):
        s = ev.StreamSession(
            0.1, lut, substeps=4, roi_origin=(0, 0), hot_cap=0, n_in=1,
            use_native=use_native,
        )
        try:
            s.feed(
                np.concatenate([[0.0001], t_real]),
                np.full(n_real + 1, 3, np.uint16),
                np.full(n_real + 1, 3, np.uint16),
            )
            s.flush()
            sums = []
            while (out := s.poll()) is not None:
                sums.append(int(out[0].sum()))
            # The first streak-1 real events are sacrificed to detection
            # (the trigger event itself is kept as the new t0); everything
            # after the rebase point is binned normally.
            assert sum(sums) == n_real - (streak - 1), (use_native, sums)
            assert len(sums) >= 2 and sums[-1] > 0, (use_native, sums)
        finally:
            s.close()


def test_stream_session_flush_idempotent():
    """A defensive second flush must not emit a spurious empty bin (it would
    shift bin indices and advance membranes one extra step downstream)."""
    lut = np.zeros((80, 80), np.int32)
    for use_native in ([True, False] if ev.get_lib() is not None else [False]):
        s = ev.StreamSession(
            0.1, lut, substeps=2, roi_origin=(0, 0), hot_cap=0, n_in=1,
            use_native=use_native,
        )
        try:
            s.feed(np.array([0.0]), np.array([1], np.uint16), np.array([1], np.uint16))
            s.flush()
            s.flush()  # finally-block style double flush
            n = 0
            while s.poll() is not None:
                n += 1
            assert n == 1, (use_native, n)
        finally:
            s.close()


def test_batch_accumulate_corruption_guard():
    """One microseconds-parsed-as-seconds timestamp in a batch accumulation
    must not preallocate gigabytes — the largest sane segment wins, matching
    the streaming replay's rule."""
    t = np.array([0.0, 0.1, 0.2, 0.3, 1.0e9])
    x = np.array([30, 31, 32, 33, 34], np.uint16)
    y = np.array([5, 5, 5, 5, 5], np.uint16)
    frames = ev.accumulate_frames(t, x, y, 0.25, (23, 0), (80, 80), 5)
    assert frames.shape[0] == 2  # bins 0..1 of the sane segment only
    assert frames.sum() == 4


def test_text_parser_long_line_and_header_parity(tmp_path):
    """Overlong lines must not shed phantom events, and a numeric-prefixed
    corrupt first line must not be eaten as a header — native and fallback
    agree."""
    path = tmp_path / "ev.txt"
    long_comment = "# " + "z" * 9000 + " 12 34 56 1"
    path.write_text(
        f"{long_comment}\n0.1 23 45 1\n0.2 24 46 0\n"
    )
    results = {}
    for use_native in ([True, False] if ev.get_lib() is not None else [False]):
        if use_native:
            out = ev.parse_text_events(str(path))
        else:
            # Exercise the pure-Python branch directly.
            import unittest.mock as mock

            with mock.patch.object(ev, "get_lib", return_value=None):
                out = ev.parse_text_events(str(path))
        t, x, y, pol, dims = out
        results[use_native] = (t.tolist(), x.tolist(), y.tolist(), dims)
    fallback = results[False]
    assert fallback[0] == [0.1, 0.2] and fallback[3] == (0, 0)
    if True in results:
        assert results[True] == fallback

    # Corrupt numeric-prefixed first line: not a header in either engine.
    path2 = tmp_path / "ev2.txt"
    path2.write_text("0.05 23 garbage 1\n0.1 23 45 1\n")
    for use_native in ([True, False] if ev.get_lib() is not None else [False]):
        if use_native:
            t, x, y, pol, dims = ev.parse_text_events(str(path2))
        else:
            import unittest.mock as mock

            with mock.patch.object(ev, "get_lib", return_value=None):
                t, x, y, pol, dims = ev.parse_text_events(str(path2))
        assert dims == (0, 0), (use_native, dims)
        assert t.tolist() == [0.1], (use_native, t)


def test_largest_sane_segment_isolates_mid_array_corruption():
    """A corrupt far-future timestamp in the MIDDLE of a recording breaks
    sortedness; both the positive jump before it and the negative jump after
    it must split, so the corrupt row is isolated and the real events win."""
    t = np.array([0.0, 0.1, 1.0e9, 0.2, 0.3, 0.4])
    lo, hi = ev.largest_sane_segment(t, 0.25)
    assert (lo, hi) == (3, 6)  # the real tail, not the corrupt-containing run
    x = np.full(6, 30, np.uint16)
    y = np.full(6, 5, np.uint16)
    frames = ev.accumulate_frames(t, x, y, 0.25, (23, 0), (80, 80), 5)
    assert frames.sum() == 3  # events 0.2/0.3/0.4 survive


def test_parse_text_buffer_matches_line_rules():
    """The native live-ingest buffer parser (lens_parse_text_buffer) must
    apply the Python line loop's rules: one event per '\\n'-terminated line
    with >=3 numeric tokens; headers/heartbeats/garbage skipped; the
    partial tail line left unconsumed for the next chunk."""
    import pytest

    from lens_tpu.runtime import events_native as ev

    if not ev.has_buffer_parser():
        pytest.skip("native engine unavailable")
    data = (
        b"128 128\n"           # width-height header: 2 tokens, skipped
        b"0.5 10 20 1\n"       # event with pol
        b"# comment line\n"    # non-numeric, skipped
        b"0.75 11 21\n"        # event without pol
        b"heartbeat\n"         # skipped
        b"1.25 12 22 0\n"
        b"2.0 13 2"            # partial tail: NOT consumed
    )
    t, x, y, used = ev.parse_text_buffer(data)
    np.testing.assert_array_equal(t, [0.5, 0.75, 1.25])
    np.testing.assert_array_equal(x, [10, 11, 12])
    np.testing.assert_array_equal(y, [20, 21, 22])
    assert data[:used].endswith(b"1.25 12 22 0\n")
    assert data[used:] == b"2.0 13 2"
    # The tail parses once terminated (the EOF rule in the feeder).
    t2, x2, y2, _ = ev.parse_text_buffer(data[used:] + b"\n")
    np.testing.assert_array_equal(t2, [2.0])
    np.testing.assert_array_equal(x2, [13])
    np.testing.assert_array_equal(y2, [2])
    # Empty buffer: no events, nothing consumed.
    t3, _, _, used3 = ev.parse_text_buffer(b"")
    assert len(t3) == 0 and used3 == 0


def test_live_native_ingest_matches_line_loop():
    """The live source's native buffer-parse fast path (a file-like source
    with .buffer.read1) must yield bit-identical bins to the Python line
    loop on the same text."""
    import io

    import pytest

    from lens_tpu.config import LensConfig
    from lens_tpu.runtime import events_native as ev
    from lens_tpu.runtime.stream import live_aer_bin_source

    if not ev.has_buffer_parser():
        pytest.skip("native engine unavailable")
    cfg = LensConfig(dims=10, roi_dim=80, timebin=100)
    rng = np.random.default_rng(2)
    lines = ["128 128\n"]
    for i in range(3000):
        t = i * 0.0003
        x = int(rng.integers(cfg.roi_x, cfg.roi_x + 80))
        y = int(rng.integers(cfg.roi_y, cfg.roi_y + 80))
        lines.append(f"{t:.6f} {x} {y} 1\n")
    text = "".join(lines)
    via_lines = list(live_aer_bin_source(cfg, iter(lines)))
    wrapper = io.TextIOWrapper(io.BufferedReader(io.BytesIO(text.encode())))
    via_native = list(live_aer_bin_source(cfg, wrapper))
    assert len(via_native) == len(via_lines) > 0
    for (r1, f1), (r2, f2) in zip(via_native, via_lines):
        np.testing.assert_array_equal(r1, r2)
        np.testing.assert_array_equal(f1, f2)
