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
