"""Sequence matching over similarity matrices.

The reference convolves the (Q, R) similarity matrix with an eye(L) kernel:
  - offline: valid conv then transpose (run_model.py:248-252, sad.py:39-42)
  - online:  'same' conv over a rolling 4-query window (run_speck.py:200-204)

Both are diagonal moving averages; we express them directly as jnp ops (a
diagonal sum is a tiny stack+sum — no need for a conv primitive at this size,
and XLA fuses it into neighbouring work).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def sequence_conv(sim: jnp.ndarray, seq_len: int) -> jnp.ndarray:
    """Valid diagonal mean over a (Q, R) matrix, then transpose.

    Matches conv2d(sim[None,None], eye(L)[None,None]) / L followed by .T
    (run_model.py:248-252): out[j, i] = mean_k sim[i+k, j+k],
    output shape (R-L+1, Q-L+1).  seq_len == 0 returns sim unchanged
    (run_model.py:253-254 keeps the raw matrix).
    """
    if seq_len == 0:
        return sim
    q, r = sim.shape
    # Fail fast on an impossible window: slices with negative stops wrap
    # Python-style, so an oversized L would yield an empty matrix (silent
    # 0.0 recall) or a cryptic stack-shape error (checker.py validates the
    # CLI config; this guards programmatic callers).
    assert 0 < seq_len <= min(q, r), (
        f"sequence_length {seq_len} exceeds the similarity matrix {(q, r)}"
    )
    windows = jnp.stack(
        [sim[k : q - seq_len + 1 + k, k : r - seq_len + 1 + k] for k in range(seq_len)]
    )
    return (windows.sum(axis=0) / seq_len).T


def online_sequence_conv(seq_block: np.ndarray, seq_len: int) -> np.ndarray:
    """'same'-mode diagonal conv for the online matcher.

    Matches scipy convolve2d(seq_block.T, eye(L), mode='same') / L
    (run_speck.py:200-204) where seq_block is (n_queries, R) of averaged spike
    vectors.  Returns the (R, n_queries) result.  Note convolve2d *flips* the
    kernel, so the diagonal runs anti-causally relative to correlation — we
    reproduce the convolution orientation exactly.
    """
    a = np.asarray(seq_block, dtype=np.float32).T  # (R, n)
    h, w = a.shape
    out = np.zeros_like(a)
    # 'same' origin for an L x L kernel: offset by (L-1)//2.
    c = (seq_len - 1) // 2
    for k in range(seq_len):
        # convolution: out[i, j] += a[i - (k - c), j - (k - c)]
        d = k - c
        # Explicit bounds, skipping taps shifted entirely off the block —
        # for L > 2*n_queries some |d| >= w, where the old slice arithmetic
        # produced a NEGATIVE stop (Python-wrapped into a bogus non-empty
        # slice) and crashed on shape mismatch.
        r0, r1 = max(0, -d), min(h, h - d)
        c0, c1 = max(0, -d), min(w, w - d)
        if r1 <= r0 or c1 <= c0:
            continue
        out[r0 + d : r1 + d, c0 + d : c1 + d] += a[r0:r1, c0:c1]
    return out / seq_len
