"""Cross-validation of the JAX STDP engine against an independent numpy
oracle written in the REFERENCE's tensor layout ((out, in) weights, row/col
transposes as in blitnet.py:183-254).  A layout or transpose mistake in the
(in, out) JAX translation cannot pass both formulations on random data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lens_tpu.core.stdp import LayerHyper, LayerState, stdp_update


def oracle_update(
    w_oi: np.ndarray,  # (out, in) — torch Linear layout
    thr: np.ndarray,  # (out,)
    x_state: np.ndarray,  # (out,)
    fire_rate: np.ndarray,  # (out,)
    exc_oi: np.ndarray,  # (out, in) bool
    inh_oi: np.ndarray,  # (out, in) bool
    pre: np.ndarray,  # (in,)
    idx: int,
    eta_ip: float,
    eta_stdp: float,
    spk_force: bool,
    have_rate: bool,
    prev_fire_rate=None,
):
    """The reference's update semantics, (out, in) layout throughout."""
    raw = w_oi @ pre  # (out,)
    noclp = raw.copy()
    post = np.clip(raw - thr, 0.0, 1.0)

    if spk_force:
        x_new = np.zeros_like(x_state)
        x_new[idx] = 0.5
        xdiff = np.clip(x_new - post, 0.0, 1.0)
        mpre = pre / prev_fire_rate
        # pre tiled down columns, post tiled across rows: (in, out) grids,
        # transposed into (out, in) on application (blitnet.py:208-215).
        pre_grid = np.tile(mpre.reshape(-1, 1), (1, w_oi.shape[0]))  # (in, out)
        post_grid = np.tile(xdiff.reshape(1, -1), (w_oi.shape[1], 1))  # (in, out)
        w_oi = w_oi + ((pre_grid * post_grid * exc_oi.T) * eta_stdp).T
        w_oi = w_oi + ((-pre_grid * post_grid * inh_oi.T) * (-eta_stdp)).T
    else:
        x_new = x_state
        pre_grid = np.tile(pre.reshape(-1, 1), (1, w_oi.shape[0]))
        post_grid = np.tile(post.reshape(1, -1), (w_oi.shape[1], 1))
        gate = (pre_grid > 0) * (post_grid > 0)
        w_oi = w_oi + (((0.5 - post_grid) * gate * exc_oi.T) * eta_stdp).T
        w_oi = w_oi + (((0.5 - post_grid) * gate * inh_oi.T) * (-eta_stdp)).T

    w_oi[exc_oi] = np.clip(w_oi[exc_oi], 1e-06, 10.0)
    w_oi[inh_oi] = np.clip(w_oi[inh_oi], -10.0, -1e-06)

    if have_rate and eta_ip > 0.0:
        thr = np.maximum(thr + eta_ip * (x_new - fire_rate), 0.0)

    inh_w = w_oi.T.copy()  # (in, out), zero the positives (blitnet.py:249-250)
    inh_w[inh_w > 0] = 0.0
    w_oi = w_oi + (noclp * inh_w * (eta_stdp * 50.0)).T

    return w_oi, thr, x_new


@pytest.mark.parametrize("spk_force", [False, True])
def test_jax_matches_reference_layout_oracle(spk_force):
    rng = np.random.default_rng(0 if spk_force else 1)
    n_in, n_out = 12, 9
    # Random signed weights with disjoint sign masks (as produced by init).
    w_io = rng.normal(0, 0.2, (n_in, n_out))
    exc_io = w_io > 0.05
    inh_io = w_io < -0.05
    w_io = np.where(exc_io, np.abs(w_io), np.where(inh_io, -np.abs(w_io), 0.0))
    thr = rng.uniform(0, 0.5, n_out)
    fire_rate = rng.uniform(0.3, 0.7, n_out)
    prev_rate = rng.uniform(0.3, 0.7, n_in)

    state = LayerState(
        w=jnp.asarray(w_io),
        thr=jnp.asarray(thr),
        x=jnp.zeros(n_out),
        fire_rate=jnp.asarray(fire_rate),
        const_inp=jnp.zeros(n_out),
        exc_mask=jnp.asarray(exc_io),
        inh_mask=jnp.asarray(inh_io),
    )
    hyper = LayerHyper(
        ip_rate=0.02, stdp_rate=0.01, spk_force=spk_force, have_rate=True
    )

    x_np = np.zeros(n_out)
    w_oi = w_io.T.copy()
    for step in range(5):
        pre = rng.uniform(0, 1, n_in)
        idx = int(rng.integers(0, n_out))
        state = stdp_update(
            state,
            hyper,
            jnp.asarray(pre),
            jnp.int32(idx),
            jnp.float32(0.02),
            jnp.float32(0.01),
            prev_fire_rate=jnp.asarray(prev_rate) if spk_force else None,
        )
        w_oi, thr, x_np = oracle_update(
            w_oi, thr, x_np, fire_rate, exc_io.T, inh_io.T, pre, idx,
            0.02, 0.01, spk_force, True,
            prev_fire_rate=prev_rate if spk_force else None,
        )
        np.testing.assert_allclose(np.asarray(state.w), w_oi.T, rtol=1e-5, atol=1e-8)
        np.testing.assert_allclose(np.asarray(state.thr), thr, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(state.x), x_np, rtol=1e-6)
