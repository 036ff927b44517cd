"""VPR evaluation metrics — clean-room implementations.

The reference vendors GPL-licensed code from Schubert's VPR tutorial
(reference lens/src/metrics.py:1-16).  These functions are reimplemented from
the mathematical definitions of the metrics (precision/recall over score
thresholds; recall@K over top-K retrieval) and validated against recorded
reference outputs in tests — no GPL text is copied.

Conventions (matching the reference API so the orchestrators line up):
  - S: (n_db, n_q) similarity matrix, higher = more similar
  - GThard/GTsoft: binary matrices of the same shape
  - matching='single': evaluate only the best-scoring database row per query
  - matching='multi': evaluate every (db, query) pair

Deviation (deliberate bug fix, documented per SURVEY.md §4): the reference
crashes with ZeroDivisionError when a threshold admits no predictions
(metrics.py:86).  We define precision := 1.0 when TP+FP == 0 (no predictions
=> no false positives), which leaves every other threshold's value unchanged.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def _apply_gtsoft(S: np.ndarray, GT: np.ndarray, GTsoft: Optional[np.ndarray]):
    """Ignore matches that are acceptable-but-not-exact: entries true only in
    GTsoft are forced to the global minimum score so no threshold selects them."""
    S = S.copy()
    if GTsoft is not None:
        S[GTsoft.astype(bool) & ~GT] = S.min()
    return S


def create_pr(
    S_in: np.ndarray,
    GThard: np.ndarray,
    GTsoft: Optional[np.ndarray] = None,
    matching: str = "single",
    n_thresh: int = 100,
) -> Tuple[List[float], List[float], dict]:
    """Precision/recall at n_thresh equally spaced score thresholds.

    Reference counterpart: createPR (metrics.py:21-139).  Returns (P, R,
    overlay) where overlay carries the data the reference plots at the loosest
    threshold for matching='single' (TP/FP coordinates; see
    tools/plot_results-equivalent plotting in runtime/artifacts.py).
    """
    S_in = np.asarray(S_in, dtype=np.float64)
    GT = np.asarray(GThard).astype(bool)
    assert S_in.shape == GT.shape and S_in.ndim == 2
    assert matching in ("single", "multi")
    assert n_thresh > 1

    S = _apply_gtsoft(S_in, GT, GTsoft)

    overlay: dict = {}
    if matching == "single":
        # Number of queries that have at least one ground-truth match.
        gtp = int(np.count_nonzero(GT.any(axis=0)))
        best_rows = np.argmax(S, axis=0)
        cols = np.arange(GT.shape[1])
        gt_vec = GT[best_rows, cols]  # was the best match correct?
        s_vec = S.max(axis=0)
        overlay = {"best_rows": best_rows}
    else:
        gtp = int(np.count_nonzero(GT))
        gt_vec = GT
        s_vec = S

    precisions: List[float] = [1.0]
    recalls: List[float] = [0.0]
    thresholds = np.linspace(s_vec.max(), s_vec.min(), n_thresh)
    for t in thresholds:
        pred = s_vec >= t
        tp = int(np.count_nonzero(gt_vec & pred))
        fp = int(np.count_nonzero(~gt_vec & pred))
        precisions.append(tp / (tp + fp) if (tp + fp) > 0 else 1.0)
        recalls.append(tp / gtp if gtp > 0 else 0.0)

    if matching == "single":
        # TP/FP coordinates at the loosest threshold, for the overlay plot.
        pred = s_vec >= thresholds[-1]
        tp_cols = np.where(gt_vec & pred)[0]
        fp_cols = np.where(~gt_vec & pred)[0]
        overlay.update(
            tp_cols=tp_cols,
            tp_rows=overlay["best_rows"][tp_cols],
            fp_cols=fp_cols,
            fp_rows=overlay["best_rows"][fp_cols],
        )
    return precisions, recalls, overlay


def recall_at_100_precision(
    S_in: np.ndarray,
    GThard: np.ndarray,
    GTsoft: Optional[np.ndarray] = None,
    matching: str = "multi",
    n_thresh: int = 100,
) -> float:
    """Maximum recall among thresholds with precision == 1
    (reference recallAt100precision, metrics.py:144-180)."""
    P, R, _ = create_pr(S_in, GThard, GTsoft, matching=matching, n_thresh=n_thresh)
    P = np.asarray(P)
    R = np.asarray(R)
    at_full = R[P == 1.0]
    return float(at_full.max()) if at_full.size else 0.0


def recall_at_k(
    S_in: np.ndarray,
    GThard: np.ndarray,
    GTsoft: Optional[np.ndarray] = None,
    K: int = 1,
) -> float:
    """Fraction of queries whose top-K retrieved database entries contain a
    true match (reference recallAtK, metrics.py:183-226).

    Queries with no ground-truth match at all are dropped from the
    denominator, mirroring the reference.

    Tie behavior is the reference's, reproduced deliberately: the top-K
    selection is the same default-kind `argsort(0)[-K:]` call
    (metrics.py:219), whose order among EQUAL scores is unspecified — and
    can differ from create_pr's argmax (first max).  Integer spike-count
    matrices tie often, so R@1 and the PR curve may disagree on a tied
    best match exactly as they would in the reference; "fixing" one side
    would break recorded-output parity.
    """
    S_in = np.asarray(S_in, dtype=np.float64)
    GT = np.asarray(GThard).astype(bool)
    assert S_in.shape == GT.shape and S_in.ndim == 2
    assert K >= 1

    S = _apply_gtsoft(S_in, GT, GTsoft)

    has_match = GT.sum(axis=0) > 0
    S = S[:, has_match]
    GT = GT[:, has_match]
    if GT.shape[1] == 0:
        return 0.0

    topk_rows = np.argsort(S, axis=0)[-K:, :]  # (K, n_q) highest-K rows
    cols = np.broadcast_to(np.arange(GT.shape[1]), topk_rows.shape)
    hits = GT[topk_rows, cols].any(axis=0)
    return float(hits.sum() / GT.shape[1])
