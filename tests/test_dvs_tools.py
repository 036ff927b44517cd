import numpy as np

from lens_tpu.tools.dvs import PatchMap, save_frames_png, simple_rep_frames


def test_patchmap_lookup_covers_patches():
    pm = PatchMap.create((32, 32), pixels=5, seed=0)
    assert pm.centroids.shape == (5,)
    # Every centroid's own pixel maps to its slot (unless overwritten by a
    # later patch, like the reference's dict reassignment).
    covered = set(pm.lookup[pm.lookup >= 0])
    assert covered <= set(range(5)) and len(covered) >= 1


def test_patchmap_roundtrip(tmp_path):
    pm = PatchMap.create((16, 16), pixels=4, seed=1)
    pm.save(str(tmp_path), "ref")
    pm2 = PatchMap.load(str(tmp_path), "ref")
    np.testing.assert_array_equal(pm.lookup, pm2.lookup)
    np.testing.assert_array_equal(pm.centroids, pm2.centroids)
    assert pm2.dims == (16, 16)


def test_simple_rep_accumulates():
    pm = PatchMap.create((16, 16), pixels=4, seed=2)
    cy, cx = divmod(int(pm.centroids[0]), 16)
    t = np.array([0.0, 0.05, 0.15])
    x = np.array([cx, cx, cx], np.uint16)
    y = np.array([cy, cy, cy], np.uint16)
    frames = simple_rep_frames(t, x, y, pm, timebin_hz=10.0, accum_factor=10.0)
    slot = pm.lookup[cy * 16 + cx]
    assert frames.shape[1] == 4
    assert frames[0, slot] == 20  # two events in bin 0
    assert frames[1, slot] == 10


def test_simple_rep_hot_pixel_exclusion():
    pm = PatchMap.create((16, 16), pixels=4, seed=3)
    cy, cx = divmod(int(pm.centroids[0]), 16)
    t = np.array([0.0, 0.01])
    x = np.array([cx, cx], np.uint16)
    y = np.array([cy, cy], np.uint16)
    frames = simple_rep_frames(
        t, x, y, pm, timebin_hz=10.0, hot_pixels={(int(cx), int(cy))}
    )
    assert frames.sum() == 0


def test_save_frames_png(tmp_path):
    frames = np.arange(32, dtype=np.uint8).reshape(2, 16)  # 4x4 after reshape
    save_frames_png(frames, str(tmp_path))
    assert (tmp_path / "images_00000.png").exists()
    assert (tmp_path / "images_00001.png").exists()


def test_simple_rep_unsorted_events_do_not_wrap_into_last_frames():
    """Loaders do not sort (unlike collect.py): an event EARLIER than the
    first row must not get a negative bin that np.add.at wraps into the
    final frames — the origin is the earliest event, so sorted and unsorted
    orderings of the same events produce identical frames."""
    pm = PatchMap.create((16, 16), pixels=4, seed=4)
    # 30 in-order events over 3 s, then one event from BEFORE the first.
    t = np.concatenate([np.linspace(10.0, 13.0, 30), [9.5]])
    rng = np.random.default_rng(0)
    x = rng.integers(0, 16, len(t)).astype(np.uint16)
    y = rng.integers(0, 16, len(t)).astype(np.uint16)
    unsorted = simple_rep_frames(t, x, y, pm, timebin_hz=10.0, accum_factor=50.0)
    order = np.argsort(t, kind="stable")
    ref = simple_rep_frames(
        t[order], x[order], y[order], pm, timebin_hz=10.0, accum_factor=50.0
    )
    np.testing.assert_array_equal(unsorted, ref)


def test_simple_rep_ignores_out_of_dims_events():
    """A patch map inferred from one traverse's extents, reused on another
    with larger coordinates: out-of-dims events are ignored (the reference's
    dict-lookup semantics), not an IndexError."""
    pm = PatchMap.create((16, 16), pixels=4, seed=5)
    t = np.array([0.0, 0.1, 0.2])
    x = np.array([3, 40, 5], np.uint16)  # 40 is outside the 16x16 map
    y = np.array([3, 2, 5], np.uint16)
    frames = simple_rep_frames(t, x, y, pm, timebin_hz=10.0, accum_factor=10.0)
    ref = simple_rep_frames(
        t[[0, 2]], x[[0, 2]], y[[0, 2]], pm, timebin_hz=10.0, accum_factor=10.0
    )
    np.testing.assert_array_equal(frames, ref)


def test_save_frames_png_rejects_non_square(tmp_path):
    import pytest

    with pytest.raises(ValueError, match="perfect square"):
        save_frames_png(np.zeros((2, 50), np.uint8), str(tmp_path))
