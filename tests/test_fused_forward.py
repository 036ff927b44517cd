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
    """The resident-set estimate classifies scales correctly: the LENS
    model class sits far inside the conservative (value-form) budget while
    the large synthetic exceeds it (w2 alone is 64 MiB f32) — the size
    classification the precision router and slab planner both key on."""
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


def test_pallas_bf16_exact_on_representable_weights():
    """bf16-operand kernel vs the scan bf16 route, bit-exact on weights that
    bf16 represents exactly: all products and partial sums are exact
    integers/quarter-integers in f32, so accumulation order cannot matter and
    both routes must equal the f32 oracle."""
    import jax.numpy as jnp

    from lens_tpu.core.network import forward_counts

    rng = np.random.default_rng(11)
    w1 = (rng.integers(-8, 9, (49, 63)) / 4.0).astype(np.float32)
    w2 = (rng.integers(-8, 9, (63, 41)) / 4.0).astype(np.float32)
    p = params_from_numpy(w1, w2, np.zeros(63, np.float32), np.zeros(41, np.float32))
    intens = rng.random((9, 49)).astype(np.float32)
    u = rng.random((30, 49)).astype(np.float32)
    got = np.asarray(
        forward_counts_pallas(
            p, intens, u, tile_q=8, matmul_dtype=jnp.bfloat16,
            interpret=_interpret_needed(),
        )
    )
    f32 = np.asarray(forward_counts_stepwise(p, intens, u))
    scan_bf16 = np.asarray(forward_counts(p, intens, u, matmul_dtype=jnp.bfloat16))
    np.testing.assert_array_equal(got, f32)
    np.testing.assert_array_equal(scan_bf16, f32)


def test_pallas_bf16_exact_at_lens_scale():
    """LENS-scale shapes (100->200->100, the headline model class) with
    eighth-integer weights: every product is an exact multiple of 1/64 and
    every partial sum stays far inside f32's exact range, so the result is
    independent of accumulation order and must equal the f32 oracle
    bit-for-bit.  (Arbitrary f32 weights cannot be equality-tested here:
    bf16-product accumulation order is implementation-defined — the
    persistent AOT cache can load an executable vectorized for a different
    host, which legitimately flips floor() at boundaries and cascades
    through the IAF recurrence.)"""
    import jax.numpy as jnp

    from lens_tpu.core.network import forward_counts

    rng = np.random.default_rng(12)
    w1 = (rng.integers(-16, 17, (100, 200)) / 8.0).astype(np.float32)
    w2 = (rng.integers(-16, 17, (200, 100)) / 8.0).astype(np.float32)
    p = params_from_numpy(
        w1, w2, np.zeros(200, np.float32), np.zeros(100, np.float32)
    )
    intens = rng.random((16, 100)).astype(np.float32)
    u = rng.random((25, 100)).astype(np.float32)
    got = np.asarray(
        forward_counts_pallas(
            p, intens, u, tile_q=16, matmul_dtype=jnp.bfloat16,
            interpret=_interpret_needed(),
        )
    )
    f32 = np.asarray(forward_counts_stepwise(p, intens, u))
    scan_bf16 = np.asarray(forward_counts(p, intens, u, matmul_dtype=jnp.bfloat16))
    np.testing.assert_array_equal(got, f32)
    np.testing.assert_array_equal(scan_bf16, f32)


def test_best_forward_routes_bf16_to_fused_kernel_when_scan_bound(monkeypatch):
    """A model too big for the f32-resident kernel but fitting with bf16
    weight banks must take the bf16 fused kernel (the large-model MFU
    route); the result equals the scan bf16 route bit-for-bit on
    bf16-representable weights."""
    import jax.numpy as jnp

    import lens_tpu.ops.fused_forward as ff
    from lens_tpu.core.network import forward_counts

    rng = np.random.default_rng(13)
    w1 = (rng.integers(-4, 5, (16, 256)) / 4.0).astype(np.float32)
    w2 = (rng.integers(-4, 5, (256, 256)) / 4.0).astype(np.float32)
    p = params_from_numpy(
        w1, w2, np.zeros(256, np.float32), np.zeros(256, np.float32)
    )
    intens = rng.random((5, 16)).astype(np.float32)
    u = rng.random((20, 16)).astype(np.float32)
    f32_bytes = ff.kernel_vmem_bytes(16, 256, 256, 20, 16)
    bf16_bytes = ff.kernel_vmem_bytes(16, 256, 256, 20, 16, weight_bytes=2)
    assert bf16_bytes < f32_bytes
    # Budget between the two sizes: f32 does not fit, bf16 does.
    monkeypatch.setattr(
        ff, "_PALLAS_VMEM_BUDGET_BYTES", (f32_bytes + bf16_bytes) // 2
    )
    monkeypatch.setattr(ff, "pallas_available", lambda: True)
    seen = {}
    orig = ff.forward_counts_pallas

    def spy(*args, **kwargs):
        seen["matmul_dtype"] = kwargs.get("matmul_dtype")
        kwargs["interpret"] = _interpret_needed()
        return orig(*args, **kwargs)

    monkeypatch.setattr(ff, "forward_counts_pallas", spy)
    out = np.asarray(
        ff.best_forward(p, intens, u, q_bucket=16, matmul_dtype=jnp.bfloat16)
    )
    assert seen.get("matmul_dtype") == jnp.bfloat16
    direct = np.asarray(forward_counts(p, intens, u, matmul_dtype=jnp.bfloat16))
    assert out.shape == (5, 256)
    np.testing.assert_array_equal(out, direct)


def test_best_forward_bf16_keeps_scan_when_f32_kernel_fits(monkeypatch):
    """Models inside the f32-resident budget are VMEM-bandwidth bound in the
    fused kernel, so a bf16 ask keeps the measured scan route there."""
    import jax.numpy as jnp

    import lens_tpu.ops.fused_forward as ff

    rng = np.random.default_rng(14)
    p = params_from_numpy(
        rng.normal(0, 0.3, (16, 32)).astype(np.float32),
        rng.normal(0, 0.3, (32, 8)).astype(np.float32),
        np.zeros(32, np.float32),
        np.zeros(8, np.float32),
    )
    intens = rng.random((4, 16)).astype(np.float32)
    u = rng.random((10, 16)).astype(np.float32)
    monkeypatch.setattr(ff, "pallas_available", lambda: True)

    def boom(*args, **kwargs):  # pragma: no cover - must not be reached
        raise AssertionError("bf16 ask on an f32-resident model hit pallas")

    monkeypatch.setattr(ff, "forward_counts_pallas", boom)
    out = ff.best_forward(p, intens, u, q_bucket=16, matmul_dtype=jnp.bfloat16)
    assert out.shape == (4, 8)


def test_pallas_slab_variant_matches_oracle(setup):
    """out_block (the large-model slab variant) is bit-exact vs the stepwise
    oracle: same arithmetic per slab, membranes in scratch refs, n_out padded
    up to a whole number of slabs (200 -> 256 at out_block=128, 2 slabs)."""
    params, intens, u = setup
    got = np.asarray(
        forward_counts_pallas(
            params, intens, u, tile_q=32, out_block=128,
            interpret=_interpret_needed(),
        )
    )
    expected = np.asarray(forward_counts_stepwise(params, intens, u))
    np.testing.assert_array_equal(got, expected)


def test_pallas_slab_variant_thresholds_and_floor(setup):
    params, intens, u = setup
    thr = SpikeThresholds(1.0, 3.0, 2.0)
    got = np.asarray(
        forward_counts_pallas(
            params, intens, u, spike_thresholds=thr, min_v_mem=None,
            tile_q=32, out_block=128, interpret=_interpret_needed(),
        )
    )
    expected = np.asarray(
        forward_counts_stepwise(
            params, intens, u, spike_thresholds=thr, min_v_mem=None
        )
    )
    np.testing.assert_array_equal(got, expected)


def test_pallas_slab_bf16_matches_scan_bf16():
    """Slab + bf16 operands together (the actual large-model route): exact
    vs the f32 oracle on bf16-representable weights."""
    import jax.numpy as jnp

    from lens_tpu.core.network import forward_counts

    rng = np.random.default_rng(15)
    w1 = (rng.integers(-8, 9, (49, 160)) / 4.0).astype(np.float32)
    w2 = (rng.integers(-8, 9, (160, 300)) / 4.0).astype(np.float32)
    p = params_from_numpy(
        w1, w2, np.zeros(160, np.float32), np.zeros(300, np.float32)
    )
    intens = rng.random((9, 49)).astype(np.float32)
    u = rng.random((30, 49)).astype(np.float32)
    got = np.asarray(
        forward_counts_pallas(
            p, intens, u, tile_q=8, matmul_dtype=jnp.bfloat16, out_block=128,
            interpret=_interpret_needed(),
        )
    )
    f32 = np.asarray(forward_counts_stepwise(p, intens, u))
    scan_bf16 = np.asarray(forward_counts(p, intens, u, matmul_dtype=jnp.bfloat16))
    np.testing.assert_array_equal(got, f32)
    np.testing.assert_array_equal(scan_bf16, f32)


def test_best_forward_routes_large_w2_to_slab(monkeypatch):
    """Past _W2_VALUE_BYTES_MAX the router must pass out_block (w2 held as a
    vreg value across the T-loop spills scoped VMEM past the chip limit)."""
    import jax.numpy as jnp

    import lens_tpu.ops.fused_forward as ff
    from lens_tpu.core.network import forward_counts

    rng = np.random.default_rng(16)
    w1 = (rng.integers(-4, 5, (16, 256)) / 4.0).astype(np.float32)
    w2 = (rng.integers(-4, 5, (256, 256)) / 4.0).astype(np.float32)
    p = params_from_numpy(
        w1, w2, np.zeros(256, np.float32), np.zeros(256, np.float32)
    )
    intens = rng.random((5, 16)).astype(np.float32)
    u = rng.random((20, 16)).astype(np.float32)
    f32_bytes = ff.kernel_vmem_bytes(16, 256, 256, 20, 16)
    bf16_bytes = ff.kernel_vmem_bytes(16, 256, 256, 20, 16, weight_bytes=2)
    monkeypatch.setattr(
        ff, "_PALLAS_VMEM_BUDGET_BYTES", (f32_bytes + bf16_bytes) // 2
    )
    # Slab-engaged plans consult the slab budget; pin it to the same midpoint
    # so f32 (with its slab) does not fit but bf16 does.
    monkeypatch.setattr(
        ff, "_PALLAS_SLAB_VMEM_BUDGET_BYTES", (f32_bytes + bf16_bytes) // 2
    )
    # Force the slab threshold below this w2 (256*256*2 = 128 KiB).
    monkeypatch.setattr(ff, "_W2_VALUE_BYTES_MAX", 64 * 1024)
    monkeypatch.setattr(ff, "pallas_available", lambda: True)
    seen = {}
    orig = ff.forward_counts_pallas

    def spy(*args, **kwargs):
        seen["out_block"] = kwargs.get("out_block")
        seen["matmul_dtype"] = kwargs.get("matmul_dtype")
        kwargs["interpret"] = _interpret_needed()
        return orig(*args, **kwargs)

    monkeypatch.setattr(ff, "forward_counts_pallas", spy)
    out = np.asarray(
        ff.best_forward(p, intens, u, q_bucket=16, matmul_dtype=jnp.bfloat16)
    )
    assert seen.get("matmul_dtype") == jnp.bfloat16
    assert seen.get("out_block") == 256  # min(512, n_out_p)
    direct = np.asarray(forward_counts(p, intens, u, matmul_dtype=jnp.bfloat16))
    np.testing.assert_array_equal(out, direct)


def test_planned_route_matches_router(monkeypatch):
    """planned_route (the bench's reporting helper) agrees with the plan
    best_forward executes at the production large-model shape."""
    import jax.numpy as jnp

    import lens_tpu.ops.fused_forward as ff

    monkeypatch.setattr(ff, "pallas_available", lambda: True)
    # Headline-class model: the slab form is the routed form at every
    # scale (round-5 A/B: it beats the value form on the headline too).
    assert ff.planned_route(100, 200, 100, 25, 1024) == "pallas_slab"
    # bf16 ask on an f32-resident model keeps the scan.
    assert ff.planned_route(100, 200, 100, 25, 1024, jnp.bfloat16) == "scan"
    # Production-scale model: f32 value form does not fit; the tile-shrink
    # search lands the f32 SLAB at a smaller tile, and bf16 fits at 512.
    assert ff.planned_route(1024, 2048, 8192, 250, 512) == "pallas_slab"
    assert (
        ff.planned_route(1024, 2048, 8192, 250, 512, jnp.bfloat16)
        == "pallas_slab"
    )
    # Double-database scale: bf16 slab still routes via the shrunk tile.
    assert (
        ff.planned_route(1024, 2048, 16384, 250, 768, jnp.bfloat16)
        == "pallas_slab"
    )
    # Past every tile's budget (quadruple DB, f32): the scan fallback.
    assert ff.planned_route(1024, 2048, 65536, 250, 768) == "scan"
    monkeypatch.setattr(ff, "pallas_available", lambda: False)
    assert ff.planned_route(100, 200, 100, 25, 1024) == "scan"


def test_pallas_slab_ragged_final_slab(setup):
    """out_block that does not divide the padded n_out: the kernel's static
    ragged final slab (384 = 256 + 128 at out_block=256 for n_out=200->256
    ... exercised here with n_out padded past one slab) must stay bit-exact
    — n_out never pads up to an out_block multiple (the fit estimate and
    the dispatched kernel share the 128-lane padding)."""
    rng = np.random.default_rng(41)
    params = params_from_numpy(
        rng.normal(0, 0.3, (16, 32)).astype(np.float32),
        rng.normal(0, 0.3, (32, 300)).astype(np.float32),  # pads to 384
        np.zeros(32, np.float32),
        np.zeros(300, np.float32),
    )
    intens = rng.random((9, 16)).astype(np.float32)
    u = rng.random((12, 16)).astype(np.float32)
    got = np.asarray(
        forward_counts_pallas(
            params, intens, u, tile_q=16, out_block=256,
            interpret=_interpret_needed(),
        )
    )  # slabs: 256 + ragged 128
    expected = np.asarray(forward_counts_stepwise(params, intens, u))
    np.testing.assert_array_equal(got, expected)
