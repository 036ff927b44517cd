import numpy as np
from PIL import Image

from lens_tpu.tools.analyze import analyze
from lens_tpu.tools.images import frames_from_event_arrays, rename_images


def test_analyze_similarity_matrix():
    S = np.eye(10) * 5 + np.random.default_rng(0).random((10, 10))
    GT = np.eye(10, dtype=int)
    res = analyze(S, GT)
    assert res["recall_at_n"][1] == 1.0
    assert res["auc"] > 0
    assert 0 <= res["recall_at_100_precision"] <= 1


def test_analyze_with_sequence():
    S = np.eye(12) * 5.0
    GT = np.eye(12, dtype=int)
    res = analyze(S, GT, sequence_length=2, gt_tolerance=1, apply_sequence=True)
    assert res["recall_at_n"][1] == 1.0


def test_rename_images(tmp_path):
    for name in ("b_10.png", "b_2.png", "a_1.png"):
        Image.fromarray(np.zeros((2, 2), np.uint8)).save(tmp_path / name)
    out = rename_images(str(tmp_path))
    assert out == ["images_00000.png", "images_00001.png", "images_00002.png"]
    # natural order: a_1, b_2, b_10
    assert sorted(f.name for f in tmp_path.iterdir()) == out


def test_frames_from_event_arrays_counts(tmp_path):
    ev_dir = tmp_path / "events"
    out_dir = tmp_path / "frames"
    ev_dir.mkdir()
    coords = np.array([[1, 2], [1, 2], [3, 0]])  # (x, y)
    np.save(ev_dir / "bin_00000_events.npy", coords)
    frame = np.zeros((8, 8), np.uint32)
    frame[4, 4] = 7
    np.save(ev_dir / "bin_00001_events.npy", frame)
    n = frames_from_event_arrays(str(ev_dir), str(out_dir), roi_dim=8)
    assert n == 2
    img0 = np.asarray(Image.open(out_dir / "images_00000.png"))
    assert img0[2, 1] == 2 and img0[0, 3] == 1
    img1 = np.asarray(Image.open(out_dir / "images_00001.png"))
    assert img1[4, 4] == 7
