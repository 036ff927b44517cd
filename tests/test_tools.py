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


def test_analyze_reproduces_run_pipeline_both_modes():
    """analyze() must reproduce the inference run's own numbers: raw counts
    with apply_sequence and the saved (already sequence-matched) matrix must
    agree with each other AND with the run pipeline computed by hand
    (sequence conv -> make_gt_tolerant(L, tol) -> recall; PR on the
    transposed orientation, run_model.py evaluate)."""
    from lens_tpu.metrics.gt import make_gt_tolerant
    from lens_tpu.metrics.vpr import create_pr, recall_at_k
    from lens_tpu.ops.seqmatch import sequence_conv
    from lens_tpu.run_model import RECALL_NS

    rng = np.random.default_rng(6)
    counts = rng.integers(0, 40, (30, 30)).astype(np.float64)
    GT = np.eye(30)
    L, tol = 2, 3

    from_raw = analyze(counts, GT, sequence_length=L, gt_tolerance=tol,
                       apply_sequence=True)
    S_seq = np.asarray(sequence_conv(counts, L))
    from_saved = analyze(S_seq, GT, sequence_length=L, gt_tolerance=tol)
    assert from_raw["recall_at_n"] == from_saved["recall_at_n"]
    assert from_raw["precision"] == from_saved["precision"]

    GTtol = make_gt_tolerant(GT, L, tol)
    hand = {n: round(recall_at_k(S_seq, GTtol, K=n), 4) for n in RECALL_NS}
    assert from_saved["recall_at_n"] == hand
    P, R, _ = create_pr(S_seq.T, GTtol.T, matching="single", n_thresh=100)
    assert from_saved["precision"] == P and from_saved["recall"] == R


def test_analyze_online_matches_online_recall_scoring():
    """--online scores a streaming run's matcher artifact exactly like
    online_recall's published rows: transpose + column-granularity GT, NOT
    the offline sequence crop (which would shape-mismatch or silently
    mis-score — review regression)."""
    from lens_tpu.tools.analyze import analyze_online
    from lens_tpu.tools.online_recall import online_recall

    rng = np.random.default_rng(3)
    n_places, n_q = 20, 20
    n_cols = n_q // 4  # QUERIES_PER_SEQUENCE
    # The artifact layout: one (n_places,) row per matcher column.
    artifact = rng.integers(0, 50, (n_cols, n_places)).astype(np.float64)
    GT = np.eye(n_q, dtype=int)
    res = analyze_online(artifact, GT, gt_tolerance=2)
    expected = online_recall(artifact.T, GT, tolerance=2)
    got = [round(res["recall_at_n"][n], 2) for n in (1, 5, 10, 15, 20, 25)]
    assert got == expected
    assert res["auc"] > 0


def test_analyze_full_online_matches_offline_pipeline():
    """analyze_full_online on a full-matcher artifact (sequence_conv(counts,
    L).T, possibly fewer bins than GT queries) reproduces analyze() on the
    raw counts exactly — the live --online_matcher full protocol IS the
    offline pipeline."""
    from lens_tpu.ops.seqmatch import sequence_conv
    from lens_tpu.tools.analyze import analyze_full_online

    rng = np.random.default_rng(9)
    counts = rng.integers(0, 40, (27, 30)).astype(np.float64)  # 3 bins short
    GT = np.eye(30)
    L, tol = 4, 2

    artifact = np.asarray(sequence_conv(counts, L)).T  # what the run writes
    res_full = analyze_full_online(artifact, GT, L, tol)
    res_raw = analyze(counts, GT[: counts.shape[0]], sequence_length=L,
                      gt_tolerance=tol, apply_sequence=True)
    assert res_full["recall_at_n"] == res_raw["recall_at_n"]
    assert res_full["auc"] == res_raw["auc"]
    np.testing.assert_array_equal(res_full["precision"], res_raw["precision"])
