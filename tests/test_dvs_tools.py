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
