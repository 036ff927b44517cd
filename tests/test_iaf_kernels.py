"""Streamed IAF-scan Pallas kernels (ops/iaf_kernels.py) vs the lax.scan
oracle — bit-exact in interpret mode, across thresholds, min_v floors,
reciprocal modes, integer-valued drives, and non-128-multiple widths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lens_tpu.core.iaf import iaf_step
from lens_tpu.ops.iaf_kernels import iaf_seq_counts, iaf_seq_spikes

INTERPRET = jax.default_backend() == "cpu"


def scan_oracle(h, thr, min_v):
    def step(v, h_t):
        v, s = iaf_step(v, h_t, thr, min_v)
        return v, s

    _, s = jax.lax.scan(step, jnp.zeros(h.shape[1:], jnp.float32), h)
    return np.asarray(s)


@pytest.mark.parametrize(
    "thr,min_v,recip",
    [
        (1.0, -1.0, 1.0),
        (1.0, None, 1.0),
        (2184.0, -3277.0, "verified"),  # resolved via verified_recip below
        (7.0, -7.0, None),  # true-divide path
    ],
)
def test_counts_and_spikes_match_scan(thr, min_v, recip):
    rng = np.random.default_rng(5)
    t_steps, q, n = 12, 8, 200  # n not a 128 multiple: exercises padding
    h = rng.normal(0, 2.0 * thr, (t_steps, q, n)).astype(np.float32)
    if thr > 1:
        h = np.rint(h)  # integer-valued drives for the integer-route modes
    if recip == "verified":
        # The kernel's contract is floor(v*m) exactness for PROVEN
        # multipliers only; a raw fl32(1/thr) can fail at exact threshold
        # multiples, so the test must exercise the proven value the
        # production route would pass (ADVICE r4).
        from lens_tpu.runtime.speck_sim import verified_recip

        v_max = int(t_steps * np.abs(h).max()) + 1  # membrane envelope
        recip = verified_recip(int(thr), v_max)
        assert recip is not None, "proof must hold inside the envelope"
    ref = scan_oracle(jnp.asarray(h), thr, min_v)
    counts = np.asarray(
        iaf_seq_counts(
            jnp.asarray(h), thr, min_v, recip=recip, block_n=128,
            interpret=INTERPRET,
        )
    )
    spikes = np.asarray(
        iaf_seq_spikes(
            jnp.asarray(h), thr, min_v, recip=recip, block_n=128,
            interpret=INTERPRET,
        )
    )
    np.testing.assert_array_equal(spikes, ref)
    np.testing.assert_array_equal(counts, ref.sum(axis=0))


def test_multi_block_grid_isolates_membranes():
    """Blocks along N must not leak membrane state into each other, and the
    t==0 re-init must fire per block (the scratch persists across the whole
    grid)."""
    rng = np.random.default_rng(9)
    t_steps, q, n = 6, 4, 256  # two 128-blocks
    h = np.rint(rng.normal(0, 6.0, (t_steps, q, n))).astype(np.float32)
    ref = scan_oracle(jnp.asarray(h), 3.0, -2.0)
    got = np.asarray(
        iaf_seq_spikes(
            jnp.asarray(h), 3.0, -2.0,
            recip=float(np.float32(1.0) / np.float32(3.0)),
            block_n=128, interpret=INTERPRET,
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_int32_route_bit_identical_via_f32():
    """Integer-valued f32 drives through the kernel equal the int32 scan
    exactly (the envelope the quantized dispatcher gates on)."""
    from lens_tpu.core.iaf import iaf_step_int

    rng = np.random.default_rng(3)
    t_steps, q, n = 10, 4, 128
    thr, minv = 11, -5
    h = rng.integers(-30, 40, (t_steps, q, n)).astype(np.int32)

    v = jnp.zeros((q, n), jnp.int32)
    ref = []
    for t in range(t_steps):
        v, s = iaf_step_int(v, jnp.asarray(h[t]), thr, minv)
        ref.append(np.asarray(s))
    ref = np.stack(ref)

    from lens_tpu.runtime.speck_sim import verified_recip

    m = verified_recip(thr, 10_000)
    got = np.asarray(
        iaf_seq_spikes(
            jnp.asarray(h, jnp.float32), float(thr), float(minv), recip=m,
            block_n=128, interpret=INTERPRET,
        )
    )
    np.testing.assert_array_equal(got.astype(np.int32), ref)
