"""BliTNet STDP training as pure JAX: init + one-sample update + scan driver.

Clean-room functional rebuild of the reference's mutable training core
(reference lens/src/blitnet.py:41-254, train_model.py:120-190).  The
per-sample update order is semantically sequential (each STDP step reads the
weights the previous step wrote), so one training run is a `lax.scan` over the
shuffled sample stream; parallel speedup comes from vmapping *across* sweep
configurations (parallel/sweep.py), exactly as SURVEY.md §2 prescribes.

Faithfully preserved reference quirks (SURVEY.md §7 "hard parts"):
  - `x` is only ever written in the spike-forced branch (blitnet.py:196-197),
    so feature-layer threshold plasticity always drives thresholds toward 0.
  - the annealing baseline for eta_ip is 2x the *STDP* rate, not the IP rate
    (train_model.py:151-152), and annealing fires every 10 steps though the
    comment says 100 (train_model.py:124).
  - `clamp_spikes` clamps to max 1.0 though its comment says 0.9
    (blitnet.py:177-181).
  - both exc and inh weights receive +pre*post*eta in the forced branch
    (the double negation at blitnet.py:214-215).
  - addWeights normalizes the WHOLE bank by one scalar — the L1 norm of the
    last output neuron's row (blitnet.py:164 indexes W[len(W)-1] of a 2-D
    (out, in) tensor) — not per-row/per-input (see init_weights).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class LayerState(NamedTuple):
    """Training-time state of one SNN layer (SNNLayer training init,
    blitnet.py:65-125)."""

    w: jnp.ndarray  # (n_in, n_out) signed combined weights
    thr: jnp.ndarray  # (n_out,) firing thresholds
    x: jnp.ndarray  # (n_out,) last forced-spike target (stays 0 unforced)
    fire_rate: jnp.ndarray  # (n_out,) target firing rates
    const_inp: jnp.ndarray  # (n_out,) constant input (zeros by default)
    exc_mask: jnp.ndarray  # (n_in, n_out) bool: initially-excitatory synapses
    inh_mask: jnp.ndarray  # (n_in, n_out) bool: initially-inhibitory synapses


class LayerHyper(NamedTuple):
    """Static per-layer hyperparameters."""

    ip_rate: float
    stdp_rate: float
    spk_force: bool
    have_rate: bool


def init_weights(
    key: jax.Array,
    n_in: int,
    n_out: int,
    w_range: Tuple[float, float],
    p: float,
) -> jnp.ndarray:
    """One signed weight bank (reference addWeights, blitnet.py:127-168):
    N(mean=(lo+hi)/2, std=(hi-lo)/6), wrong-sign entries zeroed, synapses kept
    with probability p, then the ENTIRE matrix divided by one scalar — the L1
    norm of the LAST OUTPUT NEURON's input-weight row.  The reference computes
    `torch.linalg.norm(W[len(W)-1], ord=1, axis=0)` on a 2-D (out, in) W
    (blitnet.py:164): `W[len(W)-1]` is the last row, and ord=1/axis=0 on that
    1-D vector is a plain abs-sum — a single scalar applied to every weight.
    In this module's (in, out) layout that row is column `n_out - 1`.  Quirk
    preserved verbatim (zero norm guarded to 1, blitnet.py:165)."""
    lo, hi = w_range
    k1, k2 = jax.random.split(key)
    w = jax.random.normal(k1, (n_in, n_out)) * ((hi - lo) / 6.0) + (lo + hi) / 2.0
    w = jnp.where(w < 0, 0.0, w) if hi != 0 else jnp.where(w > 0, 0.0, w)
    keep = jax.random.uniform(k2, (n_in, n_out)) <= p
    w = jnp.where(keep, w, 0.0)
    nrm = jnp.abs(w[:, -1]).sum()
    nrm = jnp.where(nrm == 0.0, 1.0, nrm)
    return w / nrm


def init_layer(
    key: jax.Array,
    n_in: int,
    n_out: int,
    thr_range: Tuple[float, float],
    fire_rate: Tuple[float, float],
    ip_rate: float,
    stdp_rate: float,
    p: Tuple[float, float],
    spk_force: bool = False,
    const_inp: Tuple[float, float] = (0.0, 0.0),
) -> Tuple[LayerState, LayerHyper]:
    """Training init of one layer (blitnet.py:65-125)."""
    k_thr, k_exc, k_inh, k_ci = jax.random.split(key, 4)
    thr = jax.random.uniform(
        k_thr, (n_out,), minval=thr_range[0], maxval=thr_range[1]
    )
    # Sequential target firing rates (blitnet.py:82-87): neuron i gets
    # fire_lo + (fire_hi - fire_lo)/n_out * (i+1); all-zero range stays zero.
    fl, fh = fire_rate
    if fl == 0.0 and fh == 0.0:
        rates = jnp.zeros((n_out,))
    else:
        fstep = (fh - fl) / n_out
        rates = fl + fstep * (jnp.arange(1, n_out + 1, dtype=jnp.float32))
    # have_rate checks only neuron 0's rate (blitnet.py:89) — preserved.
    have_rate = bool(rates[0] > 0.0) if n_out > 0 else False
    ci = jax.random.uniform(k_ci, (n_out,), minval=const_inp[0], maxval=const_inp[1])

    w_exc = init_weights(k_exc, n_in, n_out, (0.0, 1.0), p[0])
    w_inh = init_weights(k_inh, n_in, n_out, (-1.0, 0.0), p[1])
    w = w_exc + w_inh

    state = LayerState(
        w=w,
        thr=thr,
        x=jnp.zeros((n_out,)),
        fire_rate=rates,
        const_inp=ci,
        exc_mask=w > 0,
        inh_mask=w < 0,
    )
    hyper = LayerHyper(
        ip_rate=ip_rate, stdp_rate=stdp_rate, spk_force=spk_force, have_rate=have_rate
    )
    return state, hyper


def clamp_spikes(raw: jnp.ndarray, thr: jnp.ndarray) -> jnp.ndarray:
    """clamp(Wx - thr, 0, 1) (blitnet.py:177-181; max really is 1.0)."""
    return jnp.clip(raw - thr, 0.0, 1.0)


def annealed_etas(
    step: jnp.ndarray, total_steps: int, ip0: float, stdp0: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Learning rates in effect at 0-based `step`.

    The reference calls _anneal_learning_rate(mod=s) *after* step s, updating
    every 10 steps with pt = ((T - mod)/T)^2 and baselines init_itp =
    2*stdp_rate, init_stdp = stdp_rate (train_model.py:120-128, 151-152).
    Step 0 therefore runs on the raw config rates; step s>=1 runs on the rates
    set at mod = 10*floor((s-1)/10).
    """
    m = 10 * ((step - 1) // 10)
    pt = ((total_steps - m) / total_steps) ** 2
    eta_ip = jnp.where(step == 0, ip0, 2.0 * stdp0 * pt)
    eta_stdp = jnp.where(step == 0, stdp0, stdp0 * pt)
    return eta_ip, eta_stdp


def stdp_update(
    state: LayerState,
    hyper: LayerHyper,
    prespike: jnp.ndarray,  # (n_in,)
    idx: jnp.ndarray,  # () int — forced output index (labels/filter)
    eta_ip: jnp.ndarray,
    eta_stdp: jnp.ndarray,
    prev_fire_rate: Optional[jnp.ndarray] = None,  # (n_in,) for forced layers
) -> LayerState:
    """One STDP/ITP/homeostasis step (reference calc_stdp, blitnet.py:183-254),
    in (in, out) weight layout."""
    w = state.w
    raw = prespike @ w  # forward (train_model.py:192-205)
    noclp = raw  # pre-threshold, for inhibitory homeostasis
    post = clamp_spikes(raw, state.thr)

    if hyper.spk_force:
        # Spike forcing (blitnet.py:185-215): target one-hot 0.5 at idx; pre
        # modulated by the previous layer's target rates; both weight banks
        # move by +pre*post*eta (double negation on the inhibitory term).
        x_new = jnp.zeros_like(state.x).at[idx].set(0.5)
        xdiff = jnp.clip(x_new - post, 0.0, 1.0)
        mpre = prespike / prev_fire_rate
        outer = mpre[:, None] * xdiff[None, :]
        w = w + outer * eta_stdp * state.exc_mask
        w = w + outer * eta_stdp * state.inh_mask
    else:
        # Unsupervised rule (blitnet.py:218-231): drive active posts toward
        # 0.5 through active synapses; inhibitory bank moves oppositely.
        x_new = state.x  # never written in this branch (quirk, blitnet.py:72)
        gate = (prespike > 0)[:, None] & (post > 0)[None, :]
        dw = (0.5 - post)[None, :] * gate
        w = w + dw * eta_stdp * state.exc_mask
        w = w - dw * eta_stdp * state.inh_mask

    # Sign-preserving clamps (blitnet.py:234-235).
    w = jnp.where(state.exc_mask, jnp.clip(w, 1e-06, 10.0), w)
    w = jnp.where(state.inh_mask, jnp.clip(w, -10.0, -1e-06), w)

    # Intrinsic threshold plasticity (blitnet.py:239-243).  The reference
    # gates on the *current* eta_ip (which annealing rebases to 2x the STDP
    # rate from step 1 onward), so the gate must be dynamic, not config-time.
    thr = state.thr
    if hyper.have_rate:
        thr = jnp.where(
            eta_ip > 0.0,
            jnp.maximum(thr + eta_ip * (x_new - state.fire_rate), 0.0),
            thr,
        )

    # Inhibitory homeostasis (blitnet.py:246-251): scale negative weights by
    # the raw (unclamped, unthresholded) activity.
    inh_w = jnp.minimum(w, 0.0)
    w = w + noclp[None, :] * inh_w * (eta_stdp * 50.0)

    return state._replace(w=w, thr=thr, x=x_new)


@functools.partial(jax.jit, static_argnames=("hyper", "total_steps"))
def train_layer_scan(
    state: LayerState,
    hyper: LayerHyper,
    samples: jnp.ndarray,  # (S, n_in) ordered sample stream (epochs flattened)
    idxs: jnp.ndarray,  # (S,) int forced indices
    total_steps: int,
    prev_fire_rate: Optional[jnp.ndarray] = None,
    start_step: int | jnp.ndarray = 0,
    ip_rate: Optional[jnp.ndarray] = None,
    stdp_rate: Optional[jnp.ndarray] = None,
) -> LayerState:
    """Train one layer over an ordered stream in a single device scan
    (replaces the reference's epochs x DataLoader Python loop,
    train_model.py:155-182).  `start_step` offsets the annealing clock so a
    full run can be split into checkpointable chunks.

    `ip_rate`/`stdp_rate`: optional TRACED overrides of the static
    hyper.ip_rate/stdp_rate — the widened sweep vmaps trials with per-trial
    learning rates through one program, which a static (hashable) hyper
    cannot carry.  Semantically identical to baking the same values into
    `hyper`."""
    assert not (hyper.spk_force and prev_fire_rate is None), (
        "spike-forced layers need prev_fire_rate (the forced rule divides "
        "presynaptic spikes by the previous layer's fire rates)"
    )
    ip0 = hyper.ip_rate if ip_rate is None else ip_rate
    stdp0 = hyper.stdp_rate if stdp_rate is None else stdp_rate

    def body(carry, inp):
        st, step = carry
        sample, idx = inp
        eta_ip, eta_stdp = annealed_etas(step, total_steps, ip0, stdp0)
        st = stdp_update(st, hyper, sample, idx, eta_ip, eta_stdp, prev_fire_rate)
        return (st, step + 1), None

    (state, _), _ = jax.lax.scan(
        body, (state, jnp.asarray(start_step, jnp.int32)), (samples, idxs)
    )
    return state
