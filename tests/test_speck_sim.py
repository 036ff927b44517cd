import numpy as np
import pytest

from lens_tpu.core.network import SpikeThresholds, forward_counts, params_from_numpy
from lens_tpu.runtime.speck_sim import (
    STATE_BITS_MAX,
    WEIGHT_BITS_MAX,
    discretize,
    forward_counts_quantized,
)


@pytest.fixture
def small_params():
    rng = np.random.default_rng(0)
    return params_from_numpy(
        rng.normal(0, 0.3, (16, 32)).astype(np.float32),
        rng.normal(0, 0.3, (32, 8)).astype(np.float32),
        np.zeros(32, np.float32),
        np.zeros(8, np.float32),
    )


def test_discretize_ranges(small_params):
    qp = discretize(small_params)
    assert np.abs(np.asarray(qp.w_feat)).max() <= WEIGHT_BITS_MAX
    assert np.abs(np.asarray(qp.w_out)).max() <= WEIGHT_BITS_MAX
    assert int(qp.thr_feat) <= STATE_BITS_MAX
    # Largest weight maps to exactly the int8 limit (scale = 127/max|W|
    # unless the threshold constraint binds).
    assert np.abs(np.asarray(qp.w_feat)).max() == WEIGHT_BITS_MAX


def test_quantized_forward_deterministic(small_params):
    rng = np.random.default_rng(1)
    intens = rng.random((4, 16)).astype(np.float32)
    u = rng.random((20, 16)).astype(np.float32)
    qp = discretize(small_params)
    a = np.asarray(forward_counts_quantized(qp, intens, u))
    b = np.asarray(forward_counts_quantized(qp, intens, u))
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.int32


def test_quantized_tracks_float(small_params):
    """Quantized spike counts should approximate the float path: the chip
    simulator is the float network at 8-bit weight resolution."""
    rng = np.random.default_rng(2)
    intens = rng.random((8, 16)).astype(np.float32)
    u = rng.random((50, 16)).astype(np.float32)
    qp = discretize(small_params)
    qc = np.asarray(forward_counts_quantized(qp, intens, u), np.float64)
    fc = np.asarray(forward_counts(small_params, intens, u), np.float64)
    # Agreement on aggregate rate within a few percent.
    assert abs(qc.sum() - fc.sum()) <= max(0.05 * fc.sum(), 10)


def test_threshold_overrides_scale():
    params = params_from_numpy(
        np.full((4, 4), 0.5, np.float32),
        np.full((4, 4), 0.5, np.float32),
        np.zeros(4, np.float32),
        np.zeros(4, np.float32),
    )
    qp = discretize(params, SpikeThresholds(1.0, 10.0, 2.0))
    # Threshold constraint binds: scale = 32767/10 for the feature layer.
    assert int(qp.thr_feat) == round(10.0 * qp.scale_feat)
    assert int(qp.thr_out) == round(2.0 * qp.scale_out)
