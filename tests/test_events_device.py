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
            t, x, y, np.float32(t[0]), 0.1, n_frames=native.shape[0]
        )
    )
    np.testing.assert_array_equal(device, native)


def test_device_accumulation_sentinel_padding():
    t = np.array([0.0, 0.01, 0.02], np.float32)
    x = np.array([23, 0xFFFF, 24], np.uint16)  # middle one is padding
    y = np.array([0, 0, 1], np.uint16)
    frames = np.asarray(
        accumulate_frames_device(t, x, y, np.float32(0.0), 0.1, n_frames=1)
    )
    assert frames.sum() == 2
    assert frames[0, 0, 0] == 1 and frames[0, 1, 1] == 1
