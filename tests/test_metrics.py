import numpy as np
import pytest

from lens_tpu.metrics.gt import crop_gt_for_sequence, dilate_gt, make_gt_tolerant
from lens_tpu.metrics.vpr import create_pr, recall_at_100_precision, recall_at_k


def test_recall_at_1_perfect_diagonal():
    S = np.eye(5) + 0.01
    GT = np.eye(5, dtype=int)
    assert recall_at_k(S, GT, K=1) == 1.0


def test_recall_at_k_hand_case():
    # 3 queries; query 0 ranks its match 2nd, query 1 ranks 1st, query 2 has
    # no GT match at all (dropped from the denominator).
    S = np.array(
        [
            [0.9, 0.8, 0.1],
            [1.0, 0.2, 0.2],
            [0.1, 0.1, 0.9],
        ]
    )
    GT = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 0]])
    assert recall_at_k(S, GT, K=1) == pytest.approx(0.0)
    assert recall_at_k(S, GT, K=2) == pytest.approx(1.0)


def test_recall_at_k_gtsoft_masks_near_misses():
    S = np.array([[1.0, 0.0], [0.5, 1.0]])
    GT = np.array([[0, 0], [1, 1]])
    GTsoft = np.array([[1, 0], [1, 1]])  # (0,0) acceptable but not exact
    # With GTsoft, S[0,0] is suppressed, so query 0's top-1 becomes row 1: hit.
    assert recall_at_k(S, GT, GTsoft=GTsoft, K=1) == 1.0
    assert recall_at_k(S, GT, K=1) == 0.5


def test_create_pr_perfect_matcher_single():
    S = np.eye(4) * 10 + 1
    GT = np.eye(4, dtype=int)
    P, R, _ = create_pr(S, GT, matching="single")
    assert max(R) == 1.0
    assert all(p == 1.0 for p in P)  # never a false positive


def test_create_pr_multi_counts_all_pairs():
    S = np.array([[0.9, 0.1], [0.1, 0.9]])
    GT = np.array([[1, 0], [0, 1]])
    P, R, _ = create_pr(S, GT, matching="multi", n_thresh=10)
    assert R[0] == 0.0 and P[0] == 1.0
    assert max(R) == 1.0
    # loosest threshold admits everything: precision = 2 TP / 4 predictions
    assert P[-1] == pytest.approx(0.5)


def test_create_pr_no_zero_division():
    # Reference metrics.py:86 crashes when a threshold admits nothing; we
    # define precision=1 there (documented deviation).
    S = np.array([[1.0, 1.0], [1.0, 1.0]])
    GT = np.array([[1, 0], [0, 1]])
    P, R, _ = create_pr(S, GT, matching="multi", n_thresh=5)
    assert np.isfinite(P).all()


def test_recall_at_100_precision():
    S = np.array([[0.9, 0.8], [0.1, 0.95]])
    GT = np.array([[1, 0], [0, 1]])
    r = recall_at_100_precision(S, GT, matching="single")
    assert 0.0 <= r <= 1.0


def test_dilate_gt_matches_scipy():
    scipy_ndimage = pytest.importorskip("scipy.ndimage")
    rng = np.random.default_rng(0)
    GT = (rng.random((20, 20)) < 0.05).astype(int)
    for d in (1, 2, 3):
        expected = scipy_ndimage.binary_dilation(
            GT, structure=np.ones((2 * d + 1, 2 * d + 1))
        ).astype(int)
        np.testing.assert_array_equal(dilate_gt(GT, d), expected)


def test_crop_gt_reference_quirk():
    GT = np.arange(36).reshape(6, 6)
    # seq=2 -> GT[0:-1, 0:-1]  (run_model.py:269-270)
    np.testing.assert_array_equal(crop_gt_for_sequence(GT, 2), GT[0:-1, 0:-1])
    np.testing.assert_array_equal(crop_gt_for_sequence(GT, 4), GT[2:-1, 2:-1])
    np.testing.assert_array_equal(crop_gt_for_sequence(GT, 0), GT)


def test_make_gt_tolerant_transposes():
    GT = np.zeros((5, 5), dtype=int)
    GT[1, 3] = 1
    out = make_gt_tolerant(GT, seq_len=0, tolerance=1)
    assert out.shape == (5, 5)
    assert out[3, 1] == 1 and out[2, 0] == 1  # transposed + dilated
