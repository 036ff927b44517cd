import logging

import numpy as np
import pytest

from lens_tpu.config import LensConfig
from lens_tpu.core.network import params_from_numpy
from lens_tpu.runtime.speck_sim import discretize
from lens_tpu.runtime.stream import (
    STREAM_THRESHOLDS,
    OnlineMatcher,
    stream_forward_counts,
)


@pytest.fixture
def qparams():
    rng = np.random.default_rng(0)
    params = params_from_numpy(
        np.abs(rng.normal(0, 0.3, (16, 32))).astype(np.float32),
        np.abs(rng.normal(0, 0.3, (32, 8))).astype(np.float32),
        np.zeros(32, np.float32),
        np.zeros(8, np.float32),
    )
    return discretize(params, STREAM_THRESHOLDS)


def test_stream_forward_preserves_input_counts(qparams):
    # The deterministic spreading must deliver exactly the per-pixel counts.
    counts_in = np.array([[3, 0, 7, 1] + [0] * 12], np.int32)
    out = np.asarray(stream_forward_counts(qparams, counts_in, steps=5))
    assert out.shape == (1, 8)
    assert (out >= 0).all()


def test_stream_forward_deterministic(qparams):
    counts_in = np.random.default_rng(1).integers(0, 20, (3, 16)).astype(np.int32)
    a = np.asarray(stream_forward_counts(qparams, counts_in, steps=10))
    b = np.asarray(stream_forward_counts(qparams, counts_in, steps=10))
    np.testing.assert_array_equal(a, b)


def test_online_matcher_groups_and_matrix(tmp_path):
    logger = logging.getLogger("test-matcher")
    m = OnlineMatcher(
        n_places=10, sequence_length=2, output_folder=str(tmp_path), logger=logger
    )
    rng = np.random.default_rng(0)
    # 4 bins -> 1 row; 4 rows -> 1 matching block: need 16 bins per block.
    for _ in range(32):
        m.push(rng.integers(0, 5, 10))
    assert m.matrix is not None
    assert m.matrix.shape == (10, 8)  # two blocks of 4 columns
    assert len(m.matches) == 8
    assert (tmp_path / "similarity_matrix.npy").exists()
    saved = np.load(tmp_path / "similarity_matrix.npy")
    assert saved.shape == (8, 10)  # saved transposed (run_speck.py:219)


def test_online_matcher_cumulative_rows(tmp_path):
    logger = logging.getLogger("test-matcher2")
    m = OnlineMatcher(
        n_places=4, sequence_length=1, output_folder=str(tmp_path), logger=logger
    )
    # Row 1: integer mean of the first 4 bins (run_speck.py:195).
    for v in ([4, 0, 0, 0], [4, 0, 0, 0], [5, 0, 0, 0], [6, 0, 0, 0]):
        m.push(np.array(v))
    assert len(m._rows) == 1
    np.testing.assert_array_equal(m._rows[0], [4, 0, 0, 0])  # 19//4
    # Reference quirk: the accumulator is NOT cleared between rows
    # (run_speck.py:221 resets only after a full 4-row block), so row 2
    # includes row 1's bins: (19 + 4*1)//4 = 5.
    for _ in range(4):
        m.push(np.array([1, 0, 0, 0]))
    assert len(m._rows) == 2
    np.testing.assert_array_equal(m._rows[1], [5, 0, 0, 0])
