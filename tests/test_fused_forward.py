"""Pallas fused kernel vs the XLA scan oracle (interpret mode on CPU)."""

import jax
import numpy as np
import pytest

from lens_tpu.core.network import (
    SpikeThresholds,
    forward_counts_stepwise,
    params_from_numpy,
)
from lens_tpu.ops.fused_forward import forward_counts_pallas


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    params = params_from_numpy(
        rng.normal(0, 0.3, (100, 200)).astype(np.float32),
        rng.normal(0, 0.3, (200, 100)).astype(np.float32),
        np.zeros(200, np.float32),
        np.zeros(100, np.float32),
    )
    intens = rng.random((30, 100)).astype(np.float32)
    u = rng.random((25, 100)).astype(np.float32)
    return params, intens, u


def _interpret_needed():
    return jax.default_backend() == "cpu"


def test_pallas_matches_scan(setup):
    params, intens, u = setup
    got = np.asarray(
        forward_counts_pallas(params, intens, u, interpret=_interpret_needed())
    )
    expected = np.asarray(forward_counts_stepwise(params, intens, u))
    np.testing.assert_array_equal(got, expected)


def test_pallas_threshold_overrides(setup):
    params, intens, u = setup
    thr = SpikeThresholds(1.0, 3.0, 2.0)
    got = np.asarray(
        forward_counts_pallas(
            params, intens, u, spike_thresholds=thr, interpret=_interpret_needed()
        )
    )
    expected = np.asarray(
        forward_counts_stepwise(params, intens, u, spike_thresholds=thr)
    )
    np.testing.assert_array_equal(got, expected)


def test_pallas_no_min_v_mem(setup):
    params, intens, u = setup
    got = np.asarray(
        forward_counts_pallas(
            params, intens, u, min_v_mem=None, interpret=_interpret_needed()
        )
    )
    expected = np.asarray(forward_counts_stepwise(params, intens, u, min_v_mem=None))
    np.testing.assert_array_equal(got, expected)


def test_pallas_fuzz_shapes_and_thresholds():
    """Randomized shapes/thresholds: kernel vs scan must agree bit-for-bit."""
    rng = np.random.default_rng(7)
    for trial in range(5):
        n_in = int(rng.integers(3, 40))
        n_feat = int(rng.integers(3, 50))
        n_out = int(rng.integers(2, 30))
        q = int(rng.integers(1, 20))
        t = int(rng.integers(1, 30))
        thr = SpikeThresholds(
            1.0, float(rng.choice([1.0, 2.0, 5.0])), float(rng.choice([1.0, 3.0]))
        )
        params = params_from_numpy(
            rng.normal(0, 0.4, (n_in, n_feat)).astype(np.float32),
            rng.normal(0, 0.4, (n_feat, n_out)).astype(np.float32),
            np.zeros(n_feat, np.float32),
            np.zeros(n_out, np.float32),
        )
        intens = rng.random((q, n_in)).astype(np.float32)
        u = rng.random((t, n_in)).astype(np.float32)
        got = np.asarray(
            forward_counts_pallas(
                params, intens, u, spike_thresholds=thr, tile_q=16,
                interpret=_interpret_needed(),
            )
        )
        exp = np.asarray(
            forward_counts_stepwise(params, intens, u, spike_thresholds=thr)
        )
        np.testing.assert_array_equal(got, exp, err_msg=f"trial {trial}")


def test_pallas_multi_tile_grid(setup):
    """Grid > 1: queries spanning several tiles must equal the scan path."""
    params, intens, u = setup
    got = np.asarray(
        forward_counts_pallas(
            params, intens, u, tile_q=8, interpret=_interpret_needed()
        )
    )  # 30 queries over tile 8 -> grid of 4 with padding
    expected = np.asarray(forward_counts_stepwise(params, intens, u))
    np.testing.assert_array_equal(got, expected)


def test_pallas_padding_isolation(setup):
    """Padded lanes must never leak spikes: oddly-shaped dims."""
    rng = np.random.default_rng(1)
    params = params_from_numpy(
        rng.normal(0, 0.3, (49, 63)).astype(np.float32),
        rng.normal(0, 0.3, (63, 41)).astype(np.float32),
        np.zeros(63, np.float32),
        np.zeros(41, np.float32),
    )
    intens = rng.random((7, 49)).astype(np.float32)
    u = rng.random((15, 49)).astype(np.float32)
    got = np.asarray(
        forward_counts_pallas(params, intens, u, interpret=_interpret_needed())
    )
    expected = np.asarray(forward_counts_stepwise(params, intens, u))
    np.testing.assert_array_equal(got, expected)


def test_vmem_routing_guard():
    """Models whose weights exceed the fused kernel's VMEM-resident budget
    must route to the XLA scan (the IN1024/FN2048/DB8192 synthetic blew
    VMEM: 'Used 183.91M of 128.00M' — a routing bug for any large model)."""
    from lens_tpu.ops.fused_forward import (
        _PALLAS_VMEM_BUDGET_BYTES,
        kernel_vmem_bytes,
    )

    # The LENS model class fits comfortably.
    assert kernel_vmem_bytes(100, 200, 100, 250, 1024) < _PALLAS_VMEM_BUDGET_BYTES
    assert kernel_vmem_bytes(49, 63, 641, 1000, 1024) < _PALLAS_VMEM_BUDGET_BYTES
    # The large synthetic does not (w2 alone is 64 MiB of f32).
    assert kernel_vmem_bytes(1024, 2048, 8192, 250, 256) > _PALLAS_VMEM_BUDGET_BYTES
    # Estimate sanity: weights dominate at that scale.
    assert kernel_vmem_bytes(1024, 2048, 8192, 250, 256) > 4 * 2048 * 8192


def test_best_forward_bf16_bucket_padding_matches_direct():
    """The bf16 route through best_forward applies the query-bucket padding
    discipline (one executable per bucket, not per dataset size); padded
    zero-intensity rows never spike, so results equal the direct call."""
    import jax.numpy as jnp

    from lens_tpu.core.network import forward_counts, params_from_numpy
    from lens_tpu.ops.fused_forward import best_forward

    rng = np.random.default_rng(4)
    p = params_from_numpy(
        rng.normal(0, 0.3, (16, 32)).astype(np.float32),
        rng.normal(0, 0.3, (32, 8)).astype(np.float32),
        np.zeros(32, np.float32),
        np.zeros(8, np.float32),
    )
    intens = rng.random((7, 16)).astype(np.float32)  # odd Q: padding exercised
    u = rng.random((20, 16)).astype(np.float32)
    out = np.asarray(best_forward(p, intens, u, matmul_dtype=jnp.bfloat16))
    direct = np.asarray(forward_counts(p, intens, u, matmul_dtype=jnp.bfloat16))
    assert out.shape == (7, 8)
    np.testing.assert_array_equal(out, direct)
