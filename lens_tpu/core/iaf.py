"""Integrate-and-fire neuron as a pure JAX step function.

First-party replacement for the sinabs IAF layers the reference gets from
`from_model(..., num_timesteps=timebin, add_spiking_output=True)`
(reference run_model.py:149-156).  Semantics reproduced (sinabs defaults):

  - multi-spike: a neuron may emit floor(v/threshold) spikes per step
  - membrane-subtract reset: v -= n_spikes * threshold
  - membrane floor `min_v_mem` (sinabs from_model default -1.0)
  - default spike threshold 1.0; run_speck.py:143-144 overrides the feature
    IAF to 10 and the output IAF to 2 for on-chip operation

The cell is a (carry, input) -> (carry, spikes) step designed to live inside
`jax.lax.scan` over the time axis, batched over queries by construction
(all tensors carry a leading query axis).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def iaf_step(
    v: jnp.ndarray,
    x: jnp.ndarray,
    threshold: float | jnp.ndarray = 1.0,
    min_v_mem: Optional[float] = -1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One IAF timestep.  v, x: (..., n).  Returns (new_v, spikes)."""
    v = v + x
    spikes = jnp.maximum(jnp.floor(v / threshold), 0.0)
    v = v - spikes * threshold
    if min_v_mem is not None:
        v = jnp.maximum(v, min_v_mem)
    return v, spikes


def iaf_step_int(
    v: jnp.ndarray,
    x: jnp.ndarray,
    threshold: jnp.ndarray,
    min_v_mem: Optional[jnp.ndarray] = None,
    recip: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Integer IAF timestep for the quantized Speck simulator.

    Same dynamics as :func:`iaf_step` but in int32 arithmetic, mirroring the
    chip's integer membrane state after DynapcnnNetwork(discretize=True)
    (reference run_model.py:165-168).  `floor(v/thr)` for positive thr is
    integer floor-division.

    `recip` (optional fast path): a HOST-VERIFIED exact f32 reciprocal for
    this threshold over the model's membrane envelope
    (speck_sim.verified_recip — only passed when the exhaustive proof holds,
    which requires |v| < 2^24 so the f32 cast is lossless).  The integer
    divide becomes cast+multiply+floor (or just a max at threshold 1) —
    bit-identical by the proof, and measurably cheaper than the VPU's
    multi-cycle divide (BENCHMARKS.md round-4 kernel log).
    """
    v = v + x
    if recip is None:
        spikes = jnp.maximum(jnp.floor_divide(v, threshold), 0)
    elif recip == 1.0:
        spikes = jnp.maximum(v, 0)  # floor(v/1) clamped — no arithmetic
    else:
        spikes = jnp.maximum(
            jnp.floor(v.astype(jnp.float32) * jnp.float32(recip)), 0.0
        ).astype(v.dtype)
    v = v - spikes * threshold
    if min_v_mem is not None:
        v = jnp.maximum(v, min_v_mem)
    return v, spikes
