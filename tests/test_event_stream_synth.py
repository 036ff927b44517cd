import numpy as np

from lens_tpu.runtime import events_native as ev
from lens_tpu.tools.make_event_stream import synthesize_events


def test_synthesized_stream_reconstructs_frames():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 50, (3, 16, 16)).astype(np.uint8)
    events = synthesize_events(frames, 0.1, events_per_bin=40_000, roi_origin=(23, 0))
    assert events.shape[1] == 4
    assert (np.diff(events[:, 0]) >= 0).all()  # sorted
    # Re-accumulate through the standard preprocessing: per-bin spatial
    # distribution must match the source frame up to sampling noise.
    rec = ev.accumulate_frames(
        events[:, 0], events[:, 1].astype(np.uint16), events[:, 2].astype(np.uint16),
        0.1, (23, 0), (16, 16), hot_pixel_threshold=0, t0=0.0,
    )
    assert rec.shape[0] == 3
    for i in range(3):
        a = rec[i].astype(np.float64)
        b = frames[i].astype(np.float64)
        corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
        assert corr > 0.95
        assert a.sum() == 40_000


def test_zero_frames_produce_no_events():
    events = synthesize_events(np.zeros((2, 8, 8)), 0.1, 100)
    assert len(events) == 0
