"""Offline re-analysis of saved similarity matrices.

A working replacement for the reference's broken scratch script
lens/src/match.py (it references undefined globals — SURVEY.md C17):
load a saved similarity matrix, recompute Recall@N (and PR) against a GT
file, and emit the standard artifacts.

Two matrix layouts exist and need different GT treatment:

  OFFLINE (a (Q, R) count/distance matrix from an inference run):
    python -m lens_tpu.tools.analyze --matrix counts.npy \
        --gt .../example-reference_example-query_GT.npy \
        --sequence_length 2 --gt_tolerance 3 --apply_sequence

  ONLINE (a streaming run's similarity_matrix.npy — the OnlineMatcher
  appends one (n_places,) row per 4-query sequence column; it is already
  sequence-matched and is scored against column-granularity GT, never the
  offline sequence crop):
    python -m lens_tpu.tools.analyze --online \
        --matrix lens/output/<ts>/similarity_matrix.npy \
        --gt .../example-reference_example-query_GT.npy --gt_tolerance 3
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from lens_tpu.metrics.gt import make_gt_tolerant
from lens_tpu.metrics.vpr import create_pr, recall_at_100_precision, recall_at_k
from lens_tpu.ops.seqmatch import sequence_conv
from lens_tpu.run_model import RECALL_NS  # the canonical N list — no drift
from lens_tpu.utils.table import ascii_table

# numpy 2 renamed trapz; support both (pyproject pins only "numpy").
from lens_tpu.utils.compat import trapezoid as _trapezoid


def analyze(
    matrix: np.ndarray,
    GT: np.ndarray,
    sequence_length: int = 0,
    gt_tolerance: int = 0,
    apply_sequence: bool = False,
) -> dict:
    """Recall@N + PR + R@100P for a similarity matrix.

    `apply_sequence` reruns the offline sequence conv (for raw (Q, R) count
    matrices).  The GT gets the run pipeline's full treatment (crop for the
    sequence length, dilate, transpose — run_model.py evaluate), and the PR
    artifacts use the same transposed orientation as the run's own
    (reference run_model.py:318-327), so re-analysis reproduces the run's
    numbers exactly.  For a STREAMING run's similarity_matrix.npy use
    analyze_online — the offline crop does not apply there.
    """
    S = np.asarray(matrix, np.float64)
    if apply_sequence and sequence_length:
        S = np.asarray(sequence_conv(S, sequence_length))
    GT = make_gt_tolerant(GT, sequence_length, gt_tolerance)
    recalls = {n: round(recall_at_k(S, GT, K=n), 4) for n in RECALL_NS}
    P, R, _ = create_pr(S.T, GT.T, matching="single", n_thresh=100)
    return {
        "recall_at_n": recalls,
        "precision": P,
        "recall": R,
        "recall_at_100_precision": recall_at_100_precision(
            S.T, GT.T, matching="single"
        ),
        "auc": float(_trapezoid(list(recalls.values()), RECALL_NS)),
    }


def analyze_online(matrix: np.ndarray, GT: np.ndarray, gt_tolerance: int) -> dict:
    """Recall@N + PR for a STREAMING run's similarity_matrix.npy.

    The artifact is (n_cols, n_places) — one row per matcher column — so it
    is transposed and scored against column-granularity GT
    (online_recall.streaming_column_gt), exactly how STREAM_RECALL.json's
    online rows are produced; the offline sequence crop must NOT apply
    (see online_recall's module docstring)."""
    from lens_tpu.tools.online_recall import streaming_column_gt

    S = np.asarray(matrix, np.float64).T  # (n_places, n_cols)
    GTcols = streaming_column_gt(GT, gt_tolerance, S.shape[1])
    recalls = {n: round(recall_at_k(S, GTcols, K=n), 4) for n in RECALL_NS}
    P, R, _ = create_pr(S.T, GTcols.T, matching="single", n_thresh=100)
    return {
        "recall_at_n": recalls,
        "precision": P,
        "recall": R,
        "recall_at_100_precision": recall_at_100_precision(
            S.T, GTcols.T, matching="single"
        ),
        "auc": float(_trapezoid(list(recalls.values()), RECALL_NS)),
    }


def analyze_full_online(
    matrix: np.ndarray, GT: np.ndarray, sequence_length: int, gt_tolerance: int
) -> dict:
    """Recall@N + PR for a full-matcher run's distance_matrix_online.npy
    (--online_matcher full).

    The artifact is ``sequence_conv(counts, L).T`` — one (R-L+1,) row per
    query window, ALREADY sequence-matched — so it is transposed and scored
    through the offline GT treatment (crop for L, dilate, transpose;
    analyze() with apply_sequence=False).  GT's query axis is cropped to the
    stream's bin count first: stream synthesis drops partial trailing bins,
    so a streamed run can have fewer query bins than GT rows."""
    S = np.asarray(matrix, np.float64).T  # (R-L+1, Q-L+1)
    n_bins = matrix.shape[0] + sequence_length - 1
    return analyze(
        S, GT[:n_bins], sequence_length, gt_tolerance, apply_sequence=False
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Re-analyze a saved similarity matrix")
    p.add_argument("--matrix", required=True)
    p.add_argument("--gt", required=True)
    p.add_argument("--sequence_length", type=int, default=0)
    p.add_argument("--gt_tolerance", type=int, default=0)
    p.add_argument("--apply_sequence", action="store_true")
    p.add_argument(
        "--online", action="store_true",
        help="matrix is a streaming run's similarity_matrix.npy "
        "(matcher-column rows; scored against column-granularity GT)",
    )
    p.add_argument(
        "--full_online", action="store_true",
        help="matrix is a full-matcher run's distance_matrix_online.npy "
        "(query-window rows, already sequence-matched; scored through the "
        "offline GT crop at --sequence_length)",
    )
    p.add_argument("--out", default="", help="write results JSON here")
    args = p.parse_args(argv)

    S = np.load(args.matrix)
    GT = np.load(args.gt)
    if args.online:
        res = analyze_online(S, GT, args.gt_tolerance)
    elif args.full_online:
        res = analyze_full_online(S, GT, args.sequence_length, args.gt_tolerance)
    else:
        res = analyze(
            S, GT, args.sequence_length, args.gt_tolerance, args.apply_sequence
        )
    print(
        ascii_table(
            ["N", *map(str, RECALL_NS)],
            [["Recall", *[res["recall_at_n"][n] for n in RECALL_NS]]],
        )
    )
    print(f"AUC={res['auc']:.3f}  R@100P={res['recall_at_100_precision']:.3f}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
