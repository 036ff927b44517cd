import numpy as np
import pytest

from lens_tpu.core.network import SpikeThresholds, forward_counts, params_from_numpy
from lens_tpu.runtime.speck_sim import (
    STATE_BITS_MAX,
    WEIGHT_BITS_MAX,
    discretization_scale,
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
    for w in (np.asarray(qp.w_feat), np.asarray(qp.w_out)):
        # Asymmetric signed int8 range, and the binding extreme is saturated
        # exactly (the scale is chosen so one limit is hit).
        assert w.min() >= -128 and w.max() <= WEIGHT_BITS_MAX
        assert w.min() == -128 or w.max() == WEIGHT_BITS_MAX
    assert int(qp.thr_feat) <= STATE_BITS_MAX


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


def test_sinabs_scale_rule_asymmetric_range():
    """The published sinabs rule (determine_discretization_scale): the signed
    range is asymmetric — the negative extreme may reach -2^(B-1), the
    positive only 2^(B-1)-1 — and zero extremes impose no constraint."""
    # W spanning [-2, 1]: min(128/2, 127/1) = 64, NOT 127/2 = 63.5
    assert discretization_scale(-2.0, 1.0, 8) == 64.0
    # all-positive weights: only the upper limit binds
    assert discretization_scale(0.0, 0.5, 8) == 254.0
    # all-negative weights: only the lower limit binds
    assert discretization_scale(-0.5, 0.0, 8) == 256.0
    # the default IAF state tensor [thr=1, min_v=-1]: min(32768/1, 32767/1)
    assert discretization_scale(-1.0, 1.0, 16) == 32767.0
    # streaming threshold override 10 with min_v -1: 32767/10 binds
    assert discretization_scale(-1.0, 10.0, 16) == 3276.7


def test_sinabs_layer_scale_and_rounding():
    """End-to-end check of one layer pair against a hand computation of the
    sinabs algorithm, including half-to-even tie rounding (torch.round)."""
    w = np.array([[-2.0, 1.0], [0.5, 0.0117187500]], np.float32)  # scale 64
    params = params_from_numpy(
        w, np.full((2, 2), 0.25, np.float32), np.zeros(2, np.float32), np.zeros(2, np.float32)
    )
    qp = discretize(params, SpikeThresholds(1.0, 1.0, 1.0), min_v_mem=-1.0)
    assert qp.scale_feat == 64.0
    expected = np.array([[-128, 64], [32, 1]], np.int32)
    # 0.01171875 * 64 = 0.75 -> 1;  also pin a half-to-even tie:
    np.testing.assert_array_equal(np.asarray(qp.w_feat), expected)
    assert int(qp.thr_feat) == 64 and int(qp.minv_feat) == -64
    # out layer: all 0.25 -> scale 127/0.25 = 508; 0.25*508 = 127
    assert qp.scale_out == 508.0
    np.testing.assert_array_equal(np.asarray(qp.w_out), np.full((2, 2), 127))


def test_half_to_even_tie_rounding():
    """torch.round rounds .5 ties to even; the simulator must match."""
    params = params_from_numpy(
        np.array([[0.5, 1.5], [2.5, 127.0]], np.float32),  # scale 127/127 = 1
        np.full((2, 2), 0.5, np.float32),
        np.zeros(2, np.float32),
        np.zeros(2, np.float32),
    )
    qp = discretize(params, SpikeThresholds(1.0, 1.0, 1.0), min_v_mem=-1.0)
    assert qp.scale_feat == 1.0  # 127/127 binds exactly
    np.testing.assert_array_equal(
        np.asarray(qp.w_feat), np.array([[0, 2], [2, 127]], np.int32)
    )


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


def test_quantized_pallas_kernel_bit_exact_fuzz():
    """The fused-kernel quantized route must be BIT-IDENTICAL to the int32
    scan (the mode's contract).  Fuzzed over random shapes, weight scales,
    and threshold overrides, interpret mode on CPU."""
    import jax

    from lens_tpu.runtime.speck_sim import forward_counts_quantized_pallas

    interpret = jax.default_backend() == "cpu"
    rng = np.random.default_rng(11)
    for trial in range(6):
        n_in = int(rng.integers(4, 40))
        n_feat = int(rng.integers(4, 60))
        n_out = int(rng.integers(4, 40))
        q = int(rng.integers(1, 30))
        t = int(rng.integers(3, 40))
        scale = float(rng.uniform(0.05, 2.0))
        params = params_from_numpy(
            (rng.normal(0, scale, (n_in, n_feat))).astype(np.float32),
            (rng.normal(0, scale, (n_feat, n_out))).astype(np.float32),
            np.zeros(n_feat, np.float32),
            np.zeros(n_out, np.float32),
        )
        thr = SpikeThresholds(
            1.0, float(rng.choice([1.0, 2.0, 10.0])), float(rng.choice([1.0, 2.0]))
        )
        qp = discretize(params, thr, min_v_mem=-1.0)
        intens = rng.random((q, n_in)).astype(np.float32)
        u = rng.random((t, n_in)).astype(np.float32)
        ref = np.asarray(forward_counts_quantized(qp, intens, u))
        fast = np.asarray(
            forward_counts_quantized_pallas(
                qp, intens, u, tile_q=32, interpret=interpret
            )
        )[:q]
        np.testing.assert_array_equal(fast, ref, err_msg=f"trial {trial}")


def test_reciprocal_spike_count_exact_at_multiples():
    """The quantized kernel's multiply-by-reciprocal spike count (int_exact)
    must equal floor(v/thr) exactly INCLUDING at exact multiples of thr and
    just-off-by-one boundaries — the cases where a naive reciprocal multiply
    misrounds.  Checked directly against integer division over adversarial
    thresholds (the f32-reciprocal-unfriendly ones: 3, 7, 274, 2408, 32767)
    and dense boundary grids."""
    import jax

    from lens_tpu.ops.fused_forward import _spikes

    for thr in (2, 3, 7, 10, 274, 2408, 32767):
        ks = np.arange(0, 3000, 7)[: 512]
        vs = []
        for k in ks:
            vs.extend((k * thr - 1, k * thr, k * thr + 1))
        vs.extend(range(-3 * thr, 2 * thr))  # negative/small region
        v = np.asarray(sorted(set(vs)), np.float32)
        v = v[np.abs(v) < 2**24 - thr]  # the documented exactness envelope
        expect = np.maximum(np.floor_divide(v.astype(np.int64), thr), 0)
        got = np.asarray(
            jax.jit(lambda x: _spikes(x, float(thr), int_exact=True))(v)
        )
        np.testing.assert_array_equal(got.astype(np.int64), expect, err_msg=f"thr={thr}")


def test_verified_recip_is_proven_exact():
    """verified_recip returns only multipliers whose floor(v*m) equals
    floor(v/thr) over the WHOLE claimed envelope — re-proven here against
    integer division on boundary-adversarial grids, plus the kernel-level
    property that _spikes(recip=...) matches the divide."""
    import jax

    from lens_tpu.ops.fused_forward import _spikes
    from lens_tpu.runtime.speck_sim import verified_recip

    for thr in (2, 3, 7, 10, 274, 2408, 32767):
        v_max = 5_000_000
        m = verified_recip(thr, v_max)
        assert m is not None, f"thr={thr}: no verified multiplier found"
        ks = np.arange(0, v_max // thr, max((v_max // thr) // 700, 1))
        vs = []
        for k in ks:
            vs.extend((k * thr - 1, k * thr, k * thr + 1))
        vs.extend(range(-3 * thr, 2 * thr))
        v = np.asarray(sorted(set(vs)), np.float32)
        v = v[(v >= -v_max) & (v <= v_max)]
        expect = np.maximum(np.floor_divide(v.astype(np.int64), thr), 0)
        got = np.asarray(
            jax.jit(lambda x: _spikes(x, float(thr), recip=m))(v)
        )
        np.testing.assert_array_equal(
            got.astype(np.int64), expect, err_msg=f"thr={thr}"
        )


def test_bundled_model_gets_verified_recips():
    """The bundled example checkpoint's quantized form must qualify for the
    fast one-multiply spike count on BOTH layers (this is the route the
    --simulated_speck headline runs)."""
    import os

    from lens_tpu.runtime.speck_sim import quantized_pallas_recips
    from lens_tpu.utils.checkpoint import load_model

    root = os.path.join(os.path.dirname(__file__), "..")
    params = load_model(
        os.path.join(root, "lens", "models"),
        "example-reference_LENS_IN100_FN200_DB100.pth",
    )
    qp = discretize(params, SpikeThresholds(), -1.0)
    r_feat, r_out = quantized_pallas_recips(qp)
    assert r_feat is not None and r_out is not None


def test_int8_hoisted_route_bit_exact_fuzz():
    """The hoisted int8 MXU route must equal the int32 per-step scan
    bit-for-bit on random discretized models, including the streaming
    threshold overrides (10/2) and varied min_v_mem."""
    from lens_tpu.runtime.speck_sim import (
        forward_counts_quantized_int8,
        quantized_int8_ok,
    )

    rng = np.random.default_rng(7)
    cases = [
        (SpikeThresholds(), -1.0),
        (SpikeThresholds(1.0, 10.0, 2.0), -1.0),  # run_speck.py:143-144
        (SpikeThresholds(), -3.0),
    ]
    for seed in range(3):
        r = np.random.default_rng(seed)
        p = params_from_numpy(
            r.normal(0, 0.4, (24, 40)).astype(np.float32),
            r.normal(0, 0.4, (40, 12)).astype(np.float32),
            np.zeros(40, np.float32),
            np.zeros(12, np.float32),
        )
        intens = rng.random((6, 24)).astype(np.float32)
        u = rng.random((30, 24)).astype(np.float32)
        for thr, minv in cases:
            qp = discretize(p, thr, minv)
            assert quantized_int8_ok(qp)
            scan = np.asarray(forward_counts_quantized(qp, intens, u))
            i8 = np.asarray(forward_counts_quantized_int8(qp, intens, u))
            np.testing.assert_array_equal(i8, scan, err_msg=f"{thr} {minv}")


def test_int8_spike_bound_guard():
    """A model whose per-step feature drive exceeds 127 spikes must be
    refused by the int8 route (the s2 int8 cast would wrap) and routed to
    the exact scan by quantized_int8_ok."""
    from lens_tpu.runtime.speck_sim import (
        QuantizedParams,
        forward_counts_quantized_int8,
        quantized_int8_ok,
    )
    import jax.numpy as jnp

    # 200 inputs of weight 127 into one feature at threshold 1: drive_max =
    # 25400 spikes/step >> 127.
    qp = QuantizedParams(
        w_feat=jnp.full((200, 8), 127, jnp.int32),
        w_out=jnp.ones((8, 4), jnp.int32),
        thr_feat=1,
        thr_out=1,
        minv_feat=-1,
        minv_out=-1,
        scale_feat=1.0,
        scale_out=1.0,
    )
    assert not quantized_int8_ok(qp)
    with pytest.raises(AssertionError, match="int8"):
        forward_counts_quantized_int8(
            qp,
            np.ones((2, 200), np.float32),
            np.full((5, 200), 0.5, np.float32),
        )


def test_bucketed_routes_int8_when_kernel_does_not_fit(small_params, monkeypatch):
    """On a backend without the fused kernel, the bucketed dispatcher takes
    the hoisted int8 route (when exact) and the counts stay bit-identical to
    the per-step scan."""
    from lens_tpu.runtime import speck_sim

    rng = np.random.default_rng(9)
    intens = rng.random((5, 16)).astype(np.float32)
    u = rng.random((25, 16)).astype(np.float32)
    qp = discretize(small_params)
    called = {}
    real = speck_sim.forward_counts_quantized_int8

    def spy(*a, **k):
        called["int8"] = True
        return real(*a, **k)

    monkeypatch.setattr(speck_sim, "forward_counts_quantized_int8", spy)
    got = np.asarray(speck_sim.forward_counts_quantized_bucketed(qp, intens, u))
    assert called.get("int8")  # CPU: pallas unavailable -> int8 route
    np.testing.assert_array_equal(
        got, np.asarray(forward_counts_quantized(qp, intens, u))
    )


def test_int8_route_exact_at_spike_bound_127():
    """Boundary case for the s2 -> int8 cast: a model engineered so every
    feature neuron fires exactly 127 spikes per substep (the last value int8
    represents) must pass quantized_int8_ok and match the scan bit-for-bit;
    one more input pushes the bound to 128 and must be refused."""
    import jax.numpy as jnp

    from lens_tpu.runtime.speck_sim import (
        QuantizedParams,
        forward_counts_quantized_int8,
        quantized_int8_ok,
    )

    def make(n_in):
        return QuantizedParams(
            w_feat=jnp.ones((n_in, 8), jnp.int32),
            w_out=jnp.full((8, 4), 3, jnp.int32),
            thr_feat=1,
            thr_out=2,
            minv_feat=-1,
            minv_out=-1,
            scale_feat=1.0,
            scale_out=1.0,
        )

    qp = make(127)  # bound = (1 - 1 + 127) // 1 = 127: the exact limit
    assert quantized_int8_ok(qp)
    intens = np.ones((3, 127), np.float32)
    u = np.zeros((10, 127), np.float32)  # u < 1 always: dense raster
    scan = np.asarray(forward_counts_quantized(qp, intens, u))
    i8 = np.asarray(forward_counts_quantized_int8(qp, intens, u))
    np.testing.assert_array_equal(i8, scan)
    # Every feature neuron fires 127/step; layer-2 drive 8*3*127 over thr 2.
    assert scan.max() > 0

    assert not quantized_int8_ok(make(128))  # bound 128: refused


def test_discretize_memoized_per_buffer(small_params):
    """discretize is called once per compute_similarity dispatch (incl. the
    eleven p50 samples); it must return the identical QuantizedParams object
    for the same weight buffers so the downstream identity-keyed caches
    (Pallas views, int8 views) hit and no per-sample re-quantization or
    re-upload happens."""
    a = discretize(small_params)
    b = discretize(small_params)
    assert a is b
    # Different thresholds are a different cache entry, not a collision.
    c = discretize(small_params, SpikeThresholds(1.0, 10.0, 2.0))
    assert c is not a and int(c.thr_feat) != int(a.thr_feat)


def test_discretize_zero_threshold_guard():
    """Weights so large the spike threshold rounds to 0 must be refused —
    the integer IAF would floor-divide by zero and simulate garbage."""
    p = params_from_numpy(
        np.full((4, 8), 300.0, np.float32),
        np.full((8, 3), 0.1, np.float32),
        np.zeros(8, np.float32),
        np.zeros(3, np.float32),
    )
    with pytest.raises(ValueError, match="rounds\\s+to 0|rounds to 0"):
        discretize(p)


def test_f32_envelope_guard_refuses_inexact_models():
    """A model whose layer drives exceed f32's 2^24 integer envelope AND
    whose spike bound exceeds int8 has no exact route — the dispatcher must
    raise, never silently misround (the reviewer reproduced 234-spike
    errors on such a model through the old scan route)."""
    import jax.numpy as jnp

    from lens_tpu.runtime.speck_sim import (
        QuantizedParams,
        forward_counts_quantized_bucketed,
        quantized_scan_exact_ok,
    )

    n_feat = 2048
    qp = QuantizedParams(
        w_feat=jnp.full((200, n_feat), 127, jnp.int32),
        w_out=jnp.full((n_feat, 3), 127, jnp.int32),
        thr_feat=3,
        thr_out=1,
        minv_feat=-1,
        minv_out=-1,
        scale_feat=1.0,
        scale_out=1.0,
    )
    assert not quantized_scan_exact_ok(qp)
    with pytest.raises(ValueError, match="envelope"):
        forward_counts_quantized_bucketed(
            qp, np.ones((2, 200), np.float32), np.full((5, 200), 0.5, np.float32)
        )


def test_int8_view_cache_keys_on_full_dependencies():
    """_int8_views/_envelope caches must not serve stale data for a
    QuantizedParams sharing w_feat but differing in w_out or thresholds
    (the _replace pattern mesh.py uses)."""
    from lens_tpu.runtime.speck_sim import QuantizedParams, _int8_views
    import jax.numpy as jnp

    w_feat = jnp.ones((16, 8), jnp.int32) * 4
    qp1 = QuantizedParams(
        w_feat=w_feat, w_out=jnp.ones((8, 4), jnp.int32),
        thr_feat=1, thr_out=1, minv_feat=-1, minv_out=-1,
        scale_feat=1.0, scale_out=1.0,
    )
    b1 = _int8_views(qp1)[2]
    qp2 = qp1._replace(thr_feat=64)  # same buffers, different threshold
    b2 = _int8_views(qp2)[2]
    assert b1 == (1 - 1 + 64) // 1 and b2 == (64 - 1 + 64) // 64
    qp3 = qp1._replace(w_out=jnp.full((8, 4), 9, jnp.int32))
    assert int(np.asarray(_int8_views(qp3)[0]).max()) == 4
    assert int(np.asarray(_int8_views(qp3)[1]).max()) == 9  # not qp1's w_out


def test_iaf_step_int_recip_bit_identical():
    """iaf_step_int with a verified reciprocal (incl. the recip==1 shortcut)
    must equal the floor-divide form over adversarial drives: boundary
    multiples, negatives, and the minv clamp interacting with the carry."""
    import jax.numpy as jnp

    from lens_tpu.core.iaf import iaf_step_int
    from lens_tpu.runtime.speck_sim import verified_recip

    rng = np.random.default_rng(11)
    for thr in (1, 2, 7, 2184):
        m = verified_recip(thr, 1_000_000)
        assert m is not None
        v_ref = jnp.zeros((64,), jnp.int32)
        v_fast = jnp.zeros((64,), jnp.int32)
        for step in range(30):
            x = rng.integers(-3 * thr, 4 * thr, 64).astype(np.int32)
            x[:8] = (rng.integers(0, 5, 8) * thr).astype(np.int32)  # exact multiples
            v_ref, s_ref = iaf_step_int(v_ref, jnp.asarray(x), thr, -thr)
            v_fast, s_fast = iaf_step_int(
                v_fast, jnp.asarray(x), thr, -thr, recip=m
            )
            np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_fast))
            np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_fast))


def test_count_recips_fall_back_to_none_past_envelope():
    """quantized_recips_for_counts must refuse (None) when the count-scaled
    envelope exceeds the provable f32 range — the caller then keeps the
    exact integer floor-divide instead of a silently-unproven multiply."""
    import jax.numpy as jnp

    from lens_tpu.runtime.speck_sim import (
        QuantizedParams,
        quantized_recips_for_counts,
    )

    qp = QuantizedParams(
        w_feat=jnp.full((64, 8), 127, jnp.int32),
        w_out=jnp.full((8, 4), 127, jnp.int32),
        thr_feat=2, thr_out=2, minv_feat=-1, minv_out=-1,
        scale_feat=1.0, scale_out=1.0,
    )
    # k=1: drive1 = 64*127 ~ 8k — provable.
    r1 = quantized_recips_for_counts(qp, 1)
    assert r1[0] is not None
    # k huge: drive1 = 64*127*5000 ~ 4e7 > 2^24 — must refuse.
    r2 = quantized_recips_for_counts(qp, 5000)
    assert r2[0] is None


def test_verified_recip_proof_is_sensitive():
    """Mutation probe for the exhaustive proof: a multiplier strictly BELOW
    1/thr must fail (an exact multiple v = k*thr then computes v*m < k and
    floors to k-1), so the checker genuinely discriminates — it cannot pass
    an under-estimating constant.  (Multipliers slightly ABOVE the verified
    one can legitimately remain exact over a bounded envelope — validity is
    an interval, not a point — which is why the probe nudges downward.)"""
    from lens_tpu.runtime.speck_sim import verified_recip

    for thr in (3, 7, 2184):
        v_max = 2_000_000
        m = np.float32(verified_recip(thr, v_max))
        assert m >= np.float64(1.0) / thr  # verified multiplier never under
        bad = np.nextafter(np.float32(1.0) / np.float32(thr), np.float32(0.0))
        while np.float64(bad) >= np.float64(1.0) / thr:
            bad = np.nextafter(bad, np.float32(0.0))
        v = np.arange(0, v_max + 1, dtype=np.float32)
        got = np.floor(v * bad)
        want = np.floor(v.astype(np.float64) / thr)
        assert not np.array_equal(got, want), f"thr={thr}: bad recip passed"


def test_quantized_bf16_slab_route_bit_exact():
    """The bf16-operand slab route (large quantized models) must remain
    BIT-IDENTICAL to the int32 scan: int8 weights and <=256 per-step spike
    counts are bf16-exact integers, accumulation stays f32."""
    import jax
    import jax.numpy as jnp

    from lens_tpu.runtime.speck_sim import (
        forward_counts_quantized_pallas,
        quantized_bf16_operand_ok,
    )

    interpret = jax.default_backend() == "cpu"
    rng = np.random.default_rng(21)
    for trial in range(3):
        n_in = int(rng.integers(8, 40))
        n_feat = int(rng.integers(8, 60))
        n_out = int(rng.integers(130, 300))  # > 128: real multi-slab grids
        q = int(rng.integers(1, 20))
        t = int(rng.integers(3, 30))
        params = params_from_numpy(
            (rng.normal(0, 0.5, (n_in, n_feat))).astype(np.float32),
            (rng.normal(0, 0.5, (n_feat, n_out))).astype(np.float32),
            np.zeros(n_feat, np.float32),
            np.zeros(n_out, np.float32),
        )
        thr = SpikeThresholds(1.0, float(rng.choice([1.0, 2.0, 10.0])), 2.0)
        qp = discretize(params, thr, min_v_mem=-1.0)
        assert quantized_bf16_operand_ok(qp)
        intens = rng.random((q, n_in)).astype(np.float32)
        u = rng.random((t, n_in)).astype(np.float32)
        ref = np.asarray(forward_counts_quantized(qp, intens, u))
        fast = np.asarray(
            forward_counts_quantized_pallas(
                qp, intens, u, tile_q=16, interpret=interpret,
                matmul_dtype=jnp.bfloat16,
            )
        )[:q]
        np.testing.assert_array_equal(fast, ref, err_msg=f"trial {trial}")


def test_quantized_route_picks_bf16_slab_past_f32_budget(monkeypatch):
    """quantized_route must name the bf16 slab program exactly when the f32
    banks blow the budget but the bf16 banks fit — and the bucketed
    dispatcher must execute what the label says."""
    import jax
    import jax.numpy as jnp

    import lens_tpu.ops.fused_forward as ff
    from lens_tpu.runtime import speck_sim

    rng = np.random.default_rng(22)
    params = params_from_numpy(
        (rng.normal(0, 0.5, (16, 64))).astype(np.float32),
        (rng.normal(0, 0.5, (64, 256))).astype(np.float32),
        np.zeros(64, np.float32),
        np.zeros(256, np.float32),
    )
    qp = discretize(params, SpikeThresholds(1.0, 2.0, 2.0), min_v_mem=-1.0)
    f32_b = ff.kernel_vmem_bytes(16, 64, 256, 25, 16)
    bf16_b = ff.kernel_vmem_bytes(16, 64, 256, 25, 16, weight_bytes=2)
    mid = (f32_b + bf16_b) // 2
    monkeypatch.setattr(ff, "_PALLAS_VMEM_BUDGET_BYTES", mid)
    monkeypatch.setattr(ff, "_PALLAS_SLAB_VMEM_BUDGET_BYTES", mid)
    monkeypatch.setattr(ff, "pallas_available", lambda: True)
    route = speck_sim.quantized_route(qp, 16, 25, 16)
    assert route.startswith("pallas_bf16_")

    seen = {}
    real = speck_sim.forward_counts_quantized_pallas

    def spy(*a, **k):
        seen["matmul_dtype"] = k.get("matmul_dtype")
        k["interpret"] = jax.default_backend() == "cpu"
        return real(*a, **k)

    monkeypatch.setattr(speck_sim, "forward_counts_quantized_pallas", spy)
    intens = rng.random((5, 16)).astype(np.float32)
    u = rng.random((25, 16)).astype(np.float32)
    got = np.asarray(
        speck_sim.forward_counts_quantized_bucketed(qp, intens, u, q_bucket=16)
    )
    assert seen.get("matmul_dtype") == jnp.bfloat16
    np.testing.assert_array_equal(
        got, np.asarray(forward_counts_quantized(qp, intens, u))
    )
