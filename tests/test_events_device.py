import numpy as np

from lens_tpu.runtime import events_native as ev
from lens_tpu.ops.events_device import accumulate_frames_device


def test_device_accumulation_matches_native():
    rng = np.random.default_rng(0)
    n = 4000
    t = np.sort(rng.uniform(0, 0.5, n)).astype(np.float32)
    x = rng.integers(0, 128, n).astype(np.uint16)
    y = rng.integers(0, 128, n).astype(np.uint16)
    native = ev.accumulate_frames(t, x, y, 0.1, (23, 0), (80, 80), 5)
    device = np.asarray(
        accumulate_frames_device(
            t, x, y, np.float32(t[0]), 0.1, n_frames=native.shape[0], hot_thresh=5
        )
    )
    np.testing.assert_array_equal(device, native)


def test_engines_agree_on_default_hot_pixel_cap():
    """Both accumulation engines must derive the SAME default per-bin cap
    from the shared rate->bin scaling helper (the advisor flagged silently
    divergent defaults in round 1)."""
    assert ev.hot_pixel_cap(0.1) == 500  # 5 events/ms * 100 ms
    assert ev.hot_pixel_cap(0.001) == 5
    assert ev.hot_pixel_cap(0.0) == 5  # sub-ms bins floor at 1 ms
    rng = np.random.default_rng(1)
    n = 5000
    t = np.sort(rng.uniform(0, 0.3, n)).astype(np.float32)
    # concentrate on few pixels so caps actually bite
    x = (23 + rng.integers(0, 3, n)).astype(np.uint16)
    y = rng.integers(0, 3, n).astype(np.uint16)
    native = ev.accumulate_frames(t, x, y, 0.1, (23, 0), (80, 80))  # default cap
    device = np.asarray(
        accumulate_frames_device(
            t, x, y, np.float32(t[0]), 0.1, n_frames=native.shape[0]
        )
    )
    np.testing.assert_array_equal(device, native)
    assert native.max() <= 500


def test_device_accumulation_sentinel_padding():
    t = np.array([0.0, 0.01, 0.02], np.float32)
    x = np.array([23, 0xFFFF, 24], np.uint16)  # middle one is padding
    y = np.array([0, 0, 1], np.uint16)
    frames = np.asarray(
        accumulate_frames_device(t, x, y, np.float32(0.0), 0.1, n_frames=1)
    )
    assert frames.sum() == 2
    assert frames[0, 0, 0] == 1 and frames[0, 1, 1] == 1
