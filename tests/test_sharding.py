"""Multi-chip sharding on the virtual 8-device CPU mesh (SURVEY.md §2:
DP over queries, TP over the place/feature output axes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from lens_tpu.core.network import forward_counts, params_from_numpy
from lens_tpu.parallel.mesh import (
    make_mesh,
    pad_to_multiple,
    replicate,
    shard_output_axis,
    shard_queries,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    params = params_from_numpy(
        rng.normal(0, 0.3, (16, 32)).astype(np.float32),
        rng.normal(0, 0.3, (32, 16)).astype(np.float32),
        np.zeros(32, np.float32),
        np.zeros(16, np.float32),
    )
    intens = rng.random((32, 16)).astype(np.float32)
    u = rng.random((10, 16)).astype(np.float32)
    return params, intens, u


def test_dp_sharded_forward_matches_single(mesh, setup):
    params, intens, u = setup
    expected = np.asarray(forward_counts(params, jnp.asarray(intens), jnp.asarray(u)))
    q_sharded = shard_queries(mesh, jnp.asarray(intens))
    p_repl = replicate(mesh, params)
    got = forward_counts(p_repl, q_sharded, replicate(mesh, jnp.asarray(u)))
    assert "data" in str(got.sharding) or got.sharding.is_fully_replicated is False
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-6)


def test_tp_sharded_output_axis(mesh, setup):
    params, intens, u = setup
    expected = np.asarray(forward_counts(params, jnp.asarray(intens), jnp.asarray(u)))
    # Shard the place axis of w_out (and its threshold) across 'model'.
    p_tp = params._replace(
        w_feat=replicate(mesh, params.w_feat),
        w_out=shard_output_axis(mesh, params.w_out, axis=1),
        thr_feat=replicate(mesh, params.thr_feat),
        thr_out=shard_output_axis(mesh, params.thr_out, axis=0),
    )
    got = forward_counts(
        p_tp, replicate(mesh, jnp.asarray(intens)), replicate(mesh, jnp.asarray(u))
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-6)


def test_dp_times_tp_mesh(setup):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    params, intens, u = setup
    mesh = make_mesh(8, data=4)  # 4-way DP x 2-way TP
    expected = np.asarray(forward_counts(params, jnp.asarray(intens), jnp.asarray(u)))
    q = jax.device_put(jnp.asarray(intens), NamedSharding(mesh, P("data")))
    p = params._replace(
        w_feat=jax.device_put(params.w_feat, NamedSharding(mesh, P())),
        w_out=jax.device_put(params.w_out, NamedSharding(mesh, P(None, "model"))),
        thr_feat=jax.device_put(params.thr_feat, NamedSharding(mesh, P())),
        thr_out=jax.device_put(params.thr_out, NamedSharding(mesh, P("model"))),
    )
    got = forward_counts(p, q, jax.device_put(jnp.asarray(u), NamedSharding(mesh, P())))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-6)


def test_large_place_database_tp(mesh):
    """Big-DB scaling: a reference database far beyond the bundled datasets
    (R=2048), place axis sharded over 'model' — the growth path the reference
    architecture cannot take (SURVEY.md §2 TP row)."""
    rng = np.random.default_rng(42)
    n_in, n_feat, n_out, q, t = 16, 32, 2048, 8, 6
    params = params_from_numpy(
        rng.normal(0, 0.3, (n_in, n_feat)).astype(np.float32),
        rng.normal(0, 0.1, (n_feat, n_out)).astype(np.float32),
        np.zeros(n_feat, np.float32),
        np.zeros(n_out, np.float32),
    )
    intens = rng.random((q, n_in)).astype(np.float32)
    u = rng.random((t, n_in)).astype(np.float32)
    expected = np.asarray(forward_counts(params, jnp.asarray(intens), jnp.asarray(u)))

    p_tp = params._replace(
        w_feat=replicate(mesh, params.w_feat),
        w_out=shard_output_axis(mesh, params.w_out, axis=1),
        thr_feat=replicate(mesh, params.thr_feat),
        thr_out=shard_output_axis(mesh, params.thr_out, axis=0),
    )
    got = forward_counts(
        p_tp, replicate(mesh, jnp.asarray(intens)), replicate(mesh, jnp.asarray(u))
    )
    assert got.shape == (q, n_out)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-6)


def test_sharded_spike_counts_matches_single(mesh, setup):
    """The product's auto-DP eval path (run_model dispatches here when
    multiple devices exist)."""
    from lens_tpu.parallel.mesh import sharded_spike_counts

    params, intens, u = setup
    expected = np.asarray(forward_counts(params, jnp.asarray(intens), jnp.asarray(u)))
    got = sharded_spike_counts(params, intens[:27], u)  # 27 pads to 32
    np.testing.assert_allclose(got, expected[:27], rtol=1e-6)
    assert got.shape == (27, 16)


def test_pad_to_multiple():
    a = np.ones((10, 3))
    b = pad_to_multiple(a, 0, 8)
    assert b.shape == (16, 3)
    np.testing.assert_array_equal(b[10:], 0)


def test_graft_dryrun_runs():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_tp_sharded_spike_counts_large_db_bit_exact(mesh):
    """VERDICT round-1 ask #4: a 2048-place database sharded over the 'model'
    axis must produce counts IDENTICAL to the single-device path."""
    from lens_tpu.parallel.mesh import tp_sharded_spike_counts

    rng = np.random.default_rng(7)
    n_in, n_feat, n_db, n_q, t = 16, 32, 2048, 12, 10
    params = params_from_numpy(
        rng.normal(0, 0.3, (n_in, n_feat)).astype(np.float32),
        rng.normal(0, 0.3, (n_feat, n_db)).astype(np.float32),
        np.zeros(n_feat, np.float32),
        np.zeros(n_db, np.float32),
    )
    intens = rng.random((n_q, n_in)).astype(np.float32)
    u = rng.random((t, n_in)).astype(np.float32)
    single = np.asarray(forward_counts(params, jnp.asarray(intens), jnp.asarray(u)))
    tp = tp_sharded_spike_counts(params, intens, u, mesh=mesh)
    assert tp.shape == (n_q, n_db)
    np.testing.assert_array_equal(tp, single)


def test_tp_sharded_spike_counts_2d_mesh_and_padding(setup):
    """Combined DP x TP mesh (4 data x 2 model) with non-multiple Q and R:
    padding is stripped, counts still exact."""
    from lens_tpu.parallel.mesh import tp_sharded_spike_counts

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh2 = make_mesh(8, data=4)
    rng = np.random.default_rng(8)
    params = params_from_numpy(
        rng.normal(0, 0.3, (16, 32)).astype(np.float32),
        rng.normal(0, 0.3, (32, 37)).astype(np.float32),  # 37 % 2 != 0
        np.zeros(32, np.float32),
        np.zeros(37, np.float32),
    )
    intens = rng.random((9, 16)).astype(np.float32)  # 9 % 4 != 0
    u = rng.random((10, 16)).astype(np.float32)
    single = np.asarray(forward_counts(params, jnp.asarray(intens), jnp.asarray(u)))
    tp = tp_sharded_spike_counts(params, intens, u, mesh=mesh2)
    np.testing.assert_array_equal(tp, single)


def test_quantized_sharded_counts_bit_exact(mesh):
    """Quantized chip-sim counts under DP and DPxTP sharding equal the
    single-device integer scan exactly (the mode's whole point is
    bit-reproducibility — sharding must not break it)."""
    from lens_tpu.parallel.mesh import sharded_quantized_counts
    from lens_tpu.runtime.speck_sim import discretize, forward_counts_quantized

    rng = np.random.default_rng(3)
    params = params_from_numpy(
        rng.normal(0, 0.3, (16, 32)).astype(np.float32),
        rng.normal(0, 0.3, (32, 21)).astype(np.float32),  # 21: padding on TP
        np.zeros(32, np.float32),
        np.zeros(21, np.float32),
    )
    qp = discretize(params)
    intens = rng.random((11, 16)).astype(np.float32)  # 11: padding on DP
    u = rng.random((15, 16)).astype(np.float32)
    single = np.asarray(
        forward_counts_quantized(qp, jnp.asarray(intens), jnp.asarray(u))
    )
    dp = sharded_quantized_counts(qp, intens, u, mesh=mesh)
    np.testing.assert_array_equal(dp, single)
    mesh2 = make_mesh(8, data=2)
    tp = sharded_quantized_counts(qp, intens, u, mesh=mesh2, shard_places=True)
    np.testing.assert_array_equal(tp, single)


def test_tp_sharded_training_bit_exact(tiny_dataset_cfg):
    """Training with the output layer's place axis sharded over 'model' must
    produce BIT-IDENTICAL weights to the single-device run: the STDP update
    is column-parallel and zero-padded columns are inert under every rule."""
    from dataclasses import replace

    from lens_tpu.train_model import train

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = replace(tiny_dataset_cfg, epoch_feat=3, epoch_out=3)
    base = train(cfg, checkpoint_every=100)
    # tiny cfg has 10 places -> pads to 16 over 8 model shards
    tp = train(replace(cfg, shard_db=True), checkpoint_every=100)
    np.testing.assert_array_equal(np.asarray(tp.w_out), np.asarray(base.w_out))
    np.testing.assert_array_equal(np.asarray(tp.thr_out), np.asarray(base.thr_out))
    np.testing.assert_array_equal(np.asarray(tp.w_feat), np.asarray(base.w_feat))
    assert tp.w_out.shape == base.w_out.shape  # padding stripped


def test_tp_scale_smoke_16k_places(mesh):
    """Non-toy scale: a 16,384-place database trains one output-layer step
    and evaluates sharded over the mesh — the 'database past one chip'
    story at a size where a single v5e would feel it (w_out alone is
    200x16384 f32 per layer here scaled down)."""
    from lens_tpu.core.stdp import init_layer, train_layer_scan
    from lens_tpu.parallel.mesh import tp_sharded_spike_counts

    rng = np.random.default_rng(0)
    n_in, n_feat, n_db = 16, 32, 16384
    key = jax.random.PRNGKey(0)
    out_state, out_hyper = init_layer(
        key, n_feat, n_db, (0.0, 0.5), (0.5, 0.5), 0.02, 0.01, (1.0, 1.0),
        spk_force=True,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    mat = NamedSharding(mesh, P(None, "model"))
    vec = NamedSharding(mesh, P("model"))
    out_state = out_state._replace(
        w=jax.device_put(out_state.w, mat),
        thr=jax.device_put(out_state.thr, vec),
        x=jax.device_put(out_state.x, vec),
        fire_rate=jax.device_put(out_state.fire_rate, vec),
        const_inp=jax.device_put(out_state.const_inp, vec),
        exc_mask=jax.device_put(out_state.exc_mask, mat),
        inh_mask=jax.device_put(out_state.inh_mask, mat),
    )
    samples = jnp.asarray(rng.uniform(0, 1, (8, n_feat)).astype(np.float32))
    idxs = jnp.asarray(rng.integers(0, n_db, 8), jnp.int32)
    trained = train_layer_scan(
        out_state, out_hyper, samples, idxs, total_steps=8,
        prev_fire_rate=jnp.full((n_feat,), 0.5),
    )
    assert trained.w.shape == (n_feat, n_db)
    assert "model" in str(trained.w.sharding)

    params = params_from_numpy(
        rng.normal(0, 0.3, (n_in, n_feat)).astype(np.float32),
        np.asarray(trained.w, np.float32),
        np.zeros(n_feat, np.float32),
        np.zeros(n_db, np.float32),
    )
    intens = rng.random((8, n_in)).astype(np.float32)
    u = rng.random((5, n_in)).astype(np.float32)
    counts = tp_sharded_spike_counts(params, intens, u, mesh=mesh)
    assert counts.shape == (8, n_db)


def test_make_mesh_validates_factorization():
    """A 'data' axis that does not divide the device count must fail with a
    clear mesh error, not a numpy reshape traceback."""
    from lens_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="divide"):
        make_mesh(data=3)  # 8 virtual devices
    with pytest.raises(ValueError, match="divide"):
        make_mesh(data=16)
    m = make_mesh(data=2)
    assert m is make_mesh(data=2)  # memoized: stable identity for caches


def test_fleet_sessions_sharded_bit_exact(mesh):
    """sharded_fleet_step (B streaming sessions, session axis on 'data')
    must be bit-identical to each session's single-device
    stream_forward_counts_carry chain across several carried bins —
    including a session count that does not divide the mesh axis."""
    from lens_tpu.parallel.mesh import sharded_fleet_step
    from lens_tpu.runtime.speck_sim import QuantizedParams
    from lens_tpu.runtime.stream import stream_forward_counts_carry

    rng = np.random.default_rng(42)
    n_in, n_feat, n_out, B, S, n_bins = 12, 16, 8, 11, 7, 3
    qp = QuantizedParams(
        w_feat=jnp.asarray(rng.integers(-5, 6, (n_in, n_feat)), jnp.int32),
        w_out=jnp.asarray(rng.integers(-5, 6, (n_feat, n_out)), jnp.int32),
        thr_feat=7, thr_out=3, minv_feat=-4, minv_out=-2,
        scale_feat=1.0, scale_out=1.0,
    )
    streams = rng.integers(0, 4, (n_bins, B, S, n_in)).astype(np.int32)

    # Reference: per-session single-device chains.
    ref_counts = np.zeros((n_bins, B, n_out), np.int32)
    for b in range(B):
        vf = jnp.zeros((n_feat,), jnp.int32)
        vo = jnp.zeros((n_out,), jnp.int32)
        for i in range(n_bins):
            c, vf, vo, _ = stream_forward_counts_carry(
                qp, jnp.asarray(streams[i, b]), vf, vo
            )
            ref_counts[i, b] = np.asarray(c)

    # Sharded fleet: one mesh program per bin, membranes threaded through.
    vf = np.zeros((B, n_feat), np.int32)
    vo = np.zeros((B, n_out), np.int32)
    for i in range(n_bins):
        counts, vf, vo, _ = sharded_fleet_step(qp, streams[i], vf, vo, mesh=mesh)
        np.testing.assert_array_equal(counts, ref_counts[i])


def test_fused_sharded_matches_single_device():
    """The shard_map fused route (slab kernel per shard) must equal the
    single-device stepwise oracle bit-for-bit: DP over queries, TP over the
    place axis, odd R exercising the model-axis padding."""
    from lens_tpu.core.network import forward_counts_stepwise
    from lens_tpu.parallel.mesh import sharded_spike_counts_fused

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(31)
    params = params_from_numpy(
        rng.normal(0, 0.3, (16, 32)).astype(np.float32),
        rng.normal(0, 0.3, (32, 41)).astype(np.float32),  # odd place count
        np.zeros(32, np.float32),
        np.zeros(41, np.float32),
    )
    intens = rng.random((10, 16)).astype(np.float32)  # odd Q too
    u = rng.random((12, 16)).astype(np.float32)
    mesh2d = make_mesh(8, data=2)
    got = sharded_spike_counts_fused(params, intens, u, mesh=mesh2d)
    expected = np.asarray(forward_counts_stepwise(params, intens, u))
    assert got.shape == (10, 41)
    np.testing.assert_array_equal(got, expected)


def test_fused_sharded_bf16_slab_matches_scan():
    """bf16 slab kernel per shard (the multi-chip large-model route):
    bit-exact vs the scan bf16 route on bf16-representable weights.  The
    slab form is engaged unconditionally (it is the routed form at every
    scale since round 5)."""
    from lens_tpu.parallel.mesh import sharded_spike_counts_fused

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(32)
    w1 = (rng.integers(-8, 9, (16, 64)) / 4.0).astype(np.float32)
    w2 = (rng.integers(-8, 9, (64, 512)) / 4.0).astype(np.float32)
    params = params_from_numpy(
        w1, w2, np.zeros(64, np.float32), np.zeros(512, np.float32)
    )
    intens = rng.random((8, 16)).astype(np.float32)
    u = rng.random((15, 16)).astype(np.float32)
    mesh2d = make_mesh(8, data=2)
    got = sharded_spike_counts_fused(
        params, intens, u, mesh=mesh2d, matmul_dtype=jnp.bfloat16
    )
    expected = np.asarray(
        forward_counts(params, intens, u, matmul_dtype=jnp.bfloat16)
    )
    np.testing.assert_array_equal(got, expected)
