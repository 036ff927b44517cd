"""Bit-accurate quantized Speck chip simulator.

The reference's `--simulated_speck` path deploys through sinabs
`DynapcnnNetwork(discretize=True, dvs_input=True)` to physical hardware
(reference run_model.py:164-227) — impossible without a devkit.  Here the
chip is replaced by an integer spiking simulator so the mode runs anywhere
(BASELINE.json north star: "reproduces on-chip spike counts with no
samna/hardware").

Discretization semantics (first-party definition, modeled on the DynapCNN
constraints — 8-bit weights, 16-bit membrane/threshold state):

  per (weight, IAF) pair:
    scale  = min(127 / max|W|,  32767 / max(|thr|, |min_v_mem|))
    W_q    = round(W * scale)      (int, |W_q| <= 127)
    thr_q  = round(thr * scale)    (int, <= 32767)
    minv_q = round(min_v_mem * scale)

and the membrane dynamics run in exact int32 arithmetic (core/iaf.py
iaf_step_int).  Spike counts are therefore reproducible bit-for-bit across
runs and devices, which is the property the mode exists to provide.

The input stage (the reference's center-pixel conv with weight 1.0 and
threshold 1.0) quantizes to W=round(scale), thr=round(scale) — an exact
passthrough on binary DVS spikes — so the simulator operates directly on the
downsampled raster like the float path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lens_tpu.core.iaf import iaf_step_int
from lens_tpu.core.network import LensParams, SpikeThresholds

WEIGHT_BITS_MAX = 127  # 8-bit signed weights
STATE_BITS_MAX = 32767  # 16-bit signed membrane / threshold


class QuantizedParams(NamedTuple):
    w_feat: jnp.ndarray  # (n_in, n_feat) int32 (values fit int8)
    w_out: jnp.ndarray  # (n_feat, n_out) int32
    thr_feat: jnp.ndarray  # () int32 spike threshold, feature IAF
    thr_out: jnp.ndarray  # () int32 spike threshold, output IAF
    minv_feat: jnp.ndarray  # () int32 membrane floor
    minv_out: jnp.ndarray  # () int32
    scale_feat: float
    scale_out: float


def _layer_scale(w: np.ndarray, thr: float, min_v: float) -> float:
    wmax = float(np.abs(w).max())
    smax = max(abs(thr), abs(min_v), 1e-12)
    return min(WEIGHT_BITS_MAX / max(wmax, 1e-12), STATE_BITS_MAX / smax)


def discretize(
    params: LensParams,
    spike_thresholds: SpikeThresholds = SpikeThresholds(),
    min_v_mem: float = -1.0,
) -> QuantizedParams:
    """Quantize float inference params to chip integer precision."""
    w_feat = np.asarray(params.w_feat)
    w_out = np.asarray(params.w_out)
    s_feat = _layer_scale(w_feat, spike_thresholds.feat, min_v_mem)
    s_out = _layer_scale(w_out, spike_thresholds.out, min_v_mem)
    return QuantizedParams(
        w_feat=jnp.asarray(np.rint(w_feat * s_feat), jnp.int32),
        w_out=jnp.asarray(np.rint(w_out * s_out), jnp.int32),
        thr_feat=jnp.int32(round(spike_thresholds.feat * s_feat)),
        thr_out=jnp.int32(round(spike_thresholds.out * s_out)),
        minv_feat=jnp.int32(round(min_v_mem * s_feat)),
        minv_out=jnp.int32(round(min_v_mem * s_out)),
        scale_feat=s_feat,
        scale_out=s_out,
    )


def forward_counts_quantized_bucketed(
    qparams: QuantizedParams,
    intensities: jnp.ndarray,
    u_thresh: jnp.ndarray,
    q_bucket: int = 1024,
) -> jnp.ndarray:
    """Query-bucketed wrapper: pads Q up to a q_bucket multiple so every
    dataset size reuses one compiled executable (padded zero-intensity rows
    never spike; see ops/fused_forward.best_forward for the rationale)."""
    q = intensities.shape[0]
    q_p = ((q + q_bucket - 1) // q_bucket) * q_bucket
    if q_p != q:
        intensities = jnp.zeros((q_p, intensities.shape[1]), jnp.float32).at[:q].set(
            intensities
        )
    return forward_counts_quantized(qparams, intensities, u_thresh)[:q]


@jax.jit
def forward_counts_quantized(
    qparams: QuantizedParams,
    intensities: jnp.ndarray,  # (Q, n_in) float32 in [0,1]
    u_thresh: jnp.ndarray,  # (T, n_in)
) -> jnp.ndarray:
    """Integer spiking forward: the (Q, R) on-chip spike-count matrix.

    GEMMs run in float32 on the MXU — exact for these integer magnitudes
    (|acc| < 2^24) — and are rounded back to int32 for the membrane update.
    """
    q, n_in = intensities.shape
    n_feat = qparams.w_feat.shape[1]
    n_out = qparams.w_out.shape[1]
    wf = qparams.w_feat.astype(jnp.float32)
    wo = qparams.w_out.astype(jnp.float32)

    def step(carry, u_t):
        v2, v3, counts = carry
        x = (u_t[None, :] < intensities).astype(jnp.float32)
        h = jnp.dot(x, wf, preferred_element_type=jnp.float32).astype(jnp.int32)
        v2, s2 = iaf_step_int(v2, h, qparams.thr_feat, qparams.minv_feat)
        h2 = jnp.dot(
            s2.astype(jnp.float32), wo, preferred_element_type=jnp.float32
        ).astype(jnp.int32)
        v3, s3 = iaf_step_int(v3, h2, qparams.thr_out, qparams.minv_out)
        return (v2, v3, counts + s3), None

    init = (
        jnp.zeros((q, n_feat), jnp.int32),
        jnp.zeros((q, n_out), jnp.int32),
        jnp.zeros((q, n_out), jnp.int32),
    )
    (_, _, counts), _ = jax.lax.scan(step, init, u_thresh)
    return counts
