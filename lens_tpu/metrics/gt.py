"""Ground-truth handling: sequence cropping and tolerance dilation.

Reference counterparts: GT slice (run_model.py:268-270), create_GTtol via
scipy binary_dilation with a (2d+1)^2 structuring element then transpose
(run_model.py:272-294).  The dilation is a max-pool — expressed here as a
shifted-OR, no scipy needed.
"""

from __future__ import annotations

import numpy as np


def crop_gt_for_sequence(GT: np.ndarray, seq_len: int) -> np.ndarray:
    """The reference's (quirky) GT crop: GT[L-2:-1, L-2:-1] for sequence
    length L (run_model.py:269-270).  For L=2 this is GT[0:-1, 0:-1], matching
    the (Q-L+1, R-L+1) shape of the valid sequence conv on square matrices.
    Preserved verbatim — including the off-by-design last-row drop.

    Documented deviation: L <= 1 is a no-op.  A length-1 "sequence" is
    mathematically the identity (sequence_conv with eye(1) returns the full
    matrix), but the reference's slice degenerates to GT[-1:-1] — an empty
    matrix that can never match the conv output's shape, crashing every
    downstream metric for a valid config value."""
    if seq_len <= 1:
        return GT
    return GT[seq_len - 2 : -1, seq_len - 2 : -1]


def dilate_gt(GT: np.ndarray, distance: int = 2) -> np.ndarray:
    """Binary dilation with a square (2*distance+1)^2 structuring element:
    every 1 spreads to its Chebyshev-`distance` neighbourhood."""
    GT = np.asarray(GT).astype(bool)
    out = np.zeros_like(GT)
    h, w = GT.shape
    for dr in range(-distance, distance + 1):
        for dc in range(-distance, distance + 1):
            src_r = slice(max(0, -dr), min(h, h - dr))
            dst_r = slice(max(0, dr), min(h, h + dr))
            src_c = slice(max(0, -dc), min(w, w - dc))
            dst_c = slice(max(0, dc), min(w, w + dc))
            out[dst_r, dst_c] |= GT[src_r, src_c]
    return out.astype(int)


def make_gt_tolerant(GT: np.ndarray, seq_len: int, tolerance: int) -> np.ndarray:
    """Crop for the sequence matcher, dilate by the tolerance, transpose —
    the exact pipeline of run_model.py:268-294 (GTtol = dilate(crop(GT)).T)."""
    return dilate_gt(crop_gt_for_sequence(GT, seq_len), tolerance).T
