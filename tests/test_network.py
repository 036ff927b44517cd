import jax.numpy as jnp
import numpy as np
import pytest

from lens_tpu.core.network import (
    SpikeThresholds,
    forward_counts,
    forward_counts_from_frames,
    forward_counts_stepwise,
    params_from_numpy,
)


@pytest.fixture(scope="module")
def params():
    rng = np.random.default_rng(0)
    return params_from_numpy(
        rng.normal(0, 0.3, (16, 32)).astype(np.float32),
        rng.normal(0, 0.3, (32, 8)).astype(np.float32),
        np.zeros(32, np.float32),
        np.zeros(8, np.float32),
    )


def test_fast_matches_stepwise(params):
    rng = np.random.default_rng(1)
    intens = rng.random((5, 16)).astype(np.float32)
    u = rng.random((30, 16)).astype(np.float32)
    fast = np.asarray(forward_counts(params, intens, u))
    step = np.asarray(forward_counts_stepwise(params, intens, u))
    np.testing.assert_array_equal(fast, step)


def test_zero_intensity_zero_counts(params):
    intens = np.zeros((3, 16), np.float32)
    u = np.random.default_rng(2).random((10, 16)).astype(np.float32)
    counts = np.asarray(forward_counts(params, intens, u))
    assert counts.sum() == 0


def test_nonunit_input_threshold_falls_back(params):
    rng = np.random.default_rng(3)
    intens = rng.random((4, 16)).astype(np.float32)
    u = rng.random((12, 16)).astype(np.float32)
    thr = SpikeThresholds(inp=2.0, feat=1.0, out=1.0)
    got = np.asarray(forward_counts(params, intens, u, spike_thresholds=thr))
    exp = np.asarray(
        forward_counts_stepwise(params, intens, u, spike_thresholds=thr)
    )
    np.testing.assert_array_equal(got, exp)
    # threshold-2 input IAF fires every second input spike
    ones = np.asarray(
        forward_counts(params, np.ones((1, 16), np.float32), u, spike_thresholds=thr)
    )
    base = np.asarray(forward_counts(params, np.ones((1, 16), np.float32), u))
    assert ones.sum() <= base.sum()


def test_from_frames_matches_intensities(params):
    rng = np.random.default_rng(4)
    frames = rng.integers(0, 256, (6, 64), np.uint8)  # 8x8 roi, dims 4 -> k 2
    from lens_tpu.data.dataset import center_pixel_flat_indices

    sel = tuple(int(i) for i in center_pixel_flat_indices(8, 4))
    u = rng.random((9, 16)).astype(np.float32)
    got = np.asarray(forward_counts_from_frames(params, jnp.asarray(frames), u, sel))
    intens = frames[:, list(sel)].astype(np.float32) / 255.0
    exp = np.asarray(forward_counts(params, intens, u))
    np.testing.assert_array_equal(got, exp)


def test_resumable_chunks_equal_full_run(params):
    from lens_tpu.core.network import forward_counts_resumable, init_forward_carry

    rng = np.random.default_rng(5)
    intens = rng.random((4, 16)).astype(np.float32)
    u = rng.random((24, 16)).astype(np.float32)
    full = np.asarray(forward_counts(params, intens, u))

    carry = init_forward_carry(4, 16, 32, 8)
    for chunk in np.split(u, 3):  # 3 chunks of 8 steps
        counts, carry = forward_counts_resumable(params, intens, chunk, carry)
    np.testing.assert_array_equal(np.asarray(counts), full)


def test_center_pixel_k1_wraps_like_torch():
    from lens_tpu.data.dataset import center_pixel_indices

    rows, cols = center_pixel_indices(7, 7)  # k=1: torch kernel[-1] wraps to 0
    np.testing.assert_array_equal(rows, np.arange(7))


def test_bf16_matmul_route_close_to_f32(params):
    """--precision bf16 casts GEMM operands only; with accumulation still
    f32 the result equals evaluating the model with bf16-rounded weights, so
    counts should track f32 closely (integer counts, small drives)."""
    rng = np.random.default_rng(2)
    intens = rng.random((6, 16)).astype(np.float32)
    u = rng.random((40, 16)).astype(np.float32)
    f32 = np.asarray(forward_counts(params, intens, u))
    bf16 = np.asarray(forward_counts(params, intens, u, matmul_dtype=jnp.bfloat16))
    assert bf16.dtype == f32.dtype  # counts stay f32
    # Counts are integers; weight rounding flips at most the near-threshold
    # steps.  On this tiny model the routes agree on >90% of entries and
    # never by more than a few spikes.
    diff = np.abs(bf16 - f32)
    assert (diff == 0).mean() > 0.9, (diff.max(), (diff == 0).mean())
    assert diff.max() <= 3.0


def test_bf16_route_exact_on_bf16_representable_weights():
    """When the weights are already exactly representable in bf16, the bf16
    operand cast is lossless (rasters are {0,1}, spike counts are small
    integers) and the two routes must agree bit-for-bit."""
    rng = np.random.default_rng(3)
    # Quarter-integer weights: exact in bf16 (8-bit mantissa).
    w1 = (rng.integers(-8, 9, (16, 32)) / 4.0).astype(np.float32)
    w2 = (rng.integers(-8, 9, (32, 8)) / 4.0).astype(np.float32)
    p = params_from_numpy(w1, w2, np.zeros(32, np.float32), np.zeros(8, np.float32))
    intens = rng.random((5, 16)).astype(np.float32)
    u = rng.random((25, 16)).astype(np.float32)
    f32 = np.asarray(forward_counts(p, intens, u))
    bf16 = np.asarray(forward_counts(p, intens, u, matmul_dtype=jnp.bfloat16))
    np.testing.assert_array_equal(bf16, f32)


def test_bf16_route_falls_back_when_spike_bound_exceeded():
    """A model whose per-step feature spikes can exceed bf16's exact-integer
    range must not run the bf16 cast — best_forward falls back to f32 (the
    result equals the f32 route exactly)."""
    from lens_tpu.core.network import bf16_matmul_exact_ok
    from lens_tpu.ops.fused_forward import best_forward

    rng = np.random.default_rng(5)
    # 600 inputs of weight ~1 into one column: drive ~600 > 256.
    w1 = np.abs(rng.normal(1.0, 0.1, (600, 8))).astype(np.float32)
    w2 = rng.normal(0, 0.2, (8, 4)).astype(np.float32)
    p = params_from_numpy(w1, w2, np.zeros(8, np.float32), np.zeros(4, np.float32))
    assert not bf16_matmul_exact_ok(p)
    intens = rng.random((3, 600)).astype(np.float32)
    u = rng.random((10, 600)).astype(np.float32)
    f32 = np.asarray(forward_counts(p, intens, u))
    routed = np.asarray(best_forward(p, intens, u, matmul_dtype=jnp.bfloat16))
    np.testing.assert_array_equal(routed, f32)  # fell back to exact f32
