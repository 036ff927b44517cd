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
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Integer IAF timestep for the quantized Speck simulator.

    Same dynamics as :func:`iaf_step` but in int32 arithmetic, mirroring the
    chip's integer membrane state after DynapcnnNetwork(discretize=True)
    (reference run_model.py:165-168).  `floor(v/thr)` for positive thr is
    integer floor-division.
    """
    v = v + x
    spikes = jnp.maximum(jnp.floor_divide(v, threshold), 0)
    v = v - spikes * threshold
    if min_v_mem is not None:
        v = jnp.maximum(v, min_v_mem)
    return v, spikes
