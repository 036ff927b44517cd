"""The LENS spiking network as a params pytree + pure jitted programs.

Replaces the reference's nn.Sequential(conv, ReLU, Flatten, Linear, ReLU,
Linear) -> sinabs conversion (run_model.py:136-156) with one functional
forward:

    frames -> (on-device) Bernoulli raster -> scan over T of
    [IAF -> GEMM(in->feat) -> IAF -> GEMM(feat->out) -> IAF] -> spike counts

Design notes (TPU-first):
  - The center-pixel conv + its IAF are exact pass-throughs on binary spikes
    with threshold 1 (conv output = selected pixel, floor(v)=v for v in
    {0,1}), so the program rasterizes the *downsampled* image directly —
    the device never touches the 80x80 raster.  A general input-IAF is still
    applied so non-unit thresholds (quantized mode) stay correct.
  - All queries are batched into the scan: per step one (Q,in)x(in,feat) and
    one (Q,feat)x(feat,out) GEMM hit the MXU; the raster is a broadcast
    compare against the shared threshold row U[t] (see ops/raster.py).
  - Weights are stored (in, out) so the forward is x @ W; the reference/.pth
    layout (out, in) is transposed by the checkpoint converter.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lens_tpu.core.iaf import iaf_step


class LensParams(NamedTuple):
    """Inference parameters (reference SNNLayer inference mode,
    blitnet.py:59-64: a bias-free Linear + a threshold vector per layer)."""

    w_feat: jnp.ndarray  # (n_in, n_feat)
    w_out: jnp.ndarray  # (n_feat, n_out)
    thr_feat: jnp.ndarray  # (n_feat,) learned thresholds (training artifacts;
    thr_out: jnp.ndarray  # (n_out,)   unused by the float spiking forward,
    #                        matching the reference where sinabs rebuilds IAF
    #                        layers with default threshold 1.0)


class SpikeThresholds(NamedTuple):
    """Per-IAF spike thresholds.  Defaults = sinabs from_model defaults (1.0);
    the on-chip mode overrides feature/output to 10/2 (run_speck.py:143-144)."""

    inp: float = 1.0
    feat: float = 1.0
    out: float = 1.0


@functools.partial(
    jax.jit, static_argnames=("min_v_mem", "spike_thresholds", "dtype")
)
def forward_counts_stepwise(
    params: LensParams,
    intensities: jnp.ndarray,  # (Q, n_in) float32 in [0,1]
    u_thresh: jnp.ndarray,  # (T, n_in) shared Bernoulli thresholds
    spike_thresholds: SpikeThresholds = SpikeThresholds(),
    min_v_mem: Optional[float] = -1.0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Reference-shaped forward: one scan step per timestep, both GEMMs
    inside the scan.  Kept as the general path (arbitrary input-IAF
    threshold) and as the oracle the fast path is tested against.

    Exactly one full-stream chunk of forward_counts_resumable — delegated so
    the IAF pipeline exists in ONE place and the chunked streaming path can
    never diverge from this oracle."""
    q, n_in = intensities.shape
    carry = init_forward_carry(
        q, n_in, params.w_feat.shape[1], params.w_out.shape[1], dtype
    )
    counts, _ = forward_counts_resumable(
        params, intensities, u_thresh, carry, spike_thresholds, min_v_mem, dtype
    )
    return counts


@functools.partial(
    jax.jit,
    static_argnames=("min_v_mem", "spike_thresholds", "dtype", "unroll", "matmul_dtype"),
)
def forward_counts(
    params: LensParams,
    intensities: jnp.ndarray,  # (Q, n_in) float32 in [0,1]
    u_thresh: jnp.ndarray,  # (T, n_in) shared Bernoulli thresholds
    spike_thresholds: SpikeThresholds = SpikeThresholds(),
    min_v_mem: Optional[float] = -1.0,
    dtype=jnp.float32,
    unroll: int = 8,
    matmul_dtype=None,
) -> jnp.ndarray:
    """Total output spikes per (query, reference place): the (Q, R) similarity
    matrix of reference run_model.py:234-246 as one device program.

    MXU-first restructure: a GEMM is linear and time-invariant, so both
    projections are hoisted out of the time scan and batched over ALL
    timesteps — (T*Q, in) @ (in, feat) and (T*Q, feat) @ (feat, out) — and
    only the elementwise IAF recurrences remain sequential (VPU work inside
    `lax.scan`, unrolled to amortize loop overhead).  Exactness: the input
    IAF at threshold 1 on binary rasters is an identity, so hoisting GEMM 1
    is exact; GEMM 2 consumes the scanned feature spikes, so values equal
    the stepwise path's up to f32 summation order.  Falls back to the
    stepwise path when a non-unit input threshold makes the hoist invalid
    (quantized/speck paths use their own integer program).

    `matmul_dtype` (e.g. jnp.bfloat16, the MXU's native operand format —
    2x the f32 matmul throughput on large GEMM-bound models) casts the GEMM
    OPERANDS only; accumulation (`preferred_element_type`), membranes, and
    spike counts stay in `dtype`.  The only precision loss is the one-time
    rounding of the weights: rasters are exactly {0,1} and per-step feature
    spike counts are small integers (exact in bf16 below 256), so the bf16
    route evaluates the exact model with bf16-rounded weights.  Ignored by
    the stepwise fallback (non-unit input thresholds = quantized paths,
    which must stay integer-exact).
    """
    if spike_thresholds.inp != 1.0:
        return forward_counts_stepwise(
            params, intensities, u_thresh, spike_thresholds, min_v_mem, dtype
        )
    t_steps = u_thresh.shape[0]
    q, n_in = intensities.shape
    n_feat = params.w_feat.shape[1]
    n_out = params.w_out.shape[1]
    op_dtype = dtype if matmul_dtype is None else matmul_dtype
    w_feat = params.w_feat.astype(op_dtype)
    w_out = params.w_out.astype(op_dtype)

    # Raster for every (t, q) pair; input IAF(thr=1) on binary spikes is an
    # exact passthrough (floor(v)=v for v in {0,1}).
    x = (u_thresh[:, None, :] < intensities[None, :, :]).astype(op_dtype)
    h = jnp.einsum("tqi,if->tqf", x, w_feat, preferred_element_type=dtype)

    def feat_step(v, h_t):
        v, s = iaf_step(v, h_t, spike_thresholds.feat, min_v_mem)
        return v, s

    _, s2 = jax.lax.scan(
        feat_step, jnp.zeros((q, n_feat), dtype), h, unroll=unroll
    )

    h2 = jnp.einsum(
        "tqf,fo->tqo", s2.astype(op_dtype), w_out, preferred_element_type=dtype
    )

    def out_step(carry, h_t):
        v, acc = carry
        v, s = iaf_step(v, h_t, spike_thresholds.out, min_v_mem)
        return (v, acc + s), None

    (_, counts), _ = jax.lax.scan(
        out_step,
        (jnp.zeros((q, n_out), dtype), jnp.zeros((q, n_out), dtype)),
        h2,
        unroll=unroll,
    )
    return counts


@functools.partial(
    jax.jit, static_argnames=("min_v_mem", "spike_thresholds", "dtype")
)
def forward_counts_resumable(
    params: LensParams,
    intensities: jnp.ndarray,  # (Q, n_in)
    u_chunk: jnp.ndarray,  # (T_chunk, n_in)
    carry: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray],
    spike_thresholds: SpikeThresholds = SpikeThresholds(),
    min_v_mem: Optional[float] = -1.0,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, Tuple]:
    """One time-chunk of the spiking forward with explicit membrane carry.

    This is the framework's sequence-axis scaling primitive (SURVEY.md §2:
    the reference's only 'sequence' is the spike-raster time axis): an event
    stream of unbounded length is evaluated chunk by chunk, each chunk one
    device dispatch, with the (v1, v2, v3, counts) state threaded between
    calls.  Equivalent to forward_counts on the concatenated chunks.

    Use `init_forward_carry` for the first chunk.
    """
    q, n_in = intensities.shape
    w_feat = params.w_feat.astype(dtype)
    w_out = params.w_out.astype(dtype)
    intens = intensities.astype(dtype)

    def step(c, u_t):
        v1, v2, v3, counts = c
        x = (u_t[None, :] < intens).astype(dtype)
        v1, s1 = iaf_step(v1, x, spike_thresholds.inp, min_v_mem)
        h = jnp.dot(s1, w_feat, preferred_element_type=dtype)
        v2, s2 = iaf_step(v2, h, spike_thresholds.feat, min_v_mem)
        h2 = jnp.dot(s2, w_out, preferred_element_type=dtype)
        v3, s3 = iaf_step(v3, h2, spike_thresholds.out, min_v_mem)
        return (v1, v2, v3, counts + s3), None

    carry, _ = jax.lax.scan(step, carry, u_chunk.astype(dtype))
    return carry[3], carry


def init_forward_carry(
    q: int, n_in: int, n_feat: int, n_out: int, dtype=jnp.float32
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fresh membrane/count state for forward_counts_resumable."""
    return (
        jnp.zeros((q, n_in), dtype),
        jnp.zeros((q, n_feat), dtype),
        jnp.zeros((q, n_out), dtype),
        jnp.zeros((q, n_out), dtype),
    )


@functools.partial(
    jax.jit,
    static_argnames=("sel_idx", "min_v_mem", "spike_thresholds", "dtype"),
)
def forward_counts_from_frames(
    params: LensParams,
    frames_u8: jnp.ndarray,  # (Q, roi*roi) uint8 raw event frames
    u_thresh: jnp.ndarray,  # (T, n_in)
    sel_idx: tuple,  # center-pixel flat indices (static)
    spike_thresholds: SpikeThresholds = SpikeThresholds(),
    min_v_mem: Optional[float] = -1.0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """End-to-end device program: raw uint8 frames in, (Q, R) counts out.

    The host ships only the uint8 frames (the cheapest possible transfer,
    SURVEY.md §7 throughput note); center-pixel selection (run_model.py's
    conv, :129-137) and /255 normalization (dataset.py:14-26) fuse into the
    scan on device.
    """
    sel = jnp.asarray(sel_idx, jnp.int32)
    intensities = frames_u8[:, sel].astype(dtype) / 255.0
    return forward_counts(
        params, intensities, u_thresh, spike_thresholds, min_v_mem, dtype
    )


_BF16_OK_CACHE: dict = {}


def bf16_matmul_exact_ok(
    params: LensParams, thr_feat: float = 1.0
) -> bool:
    """Static check for the bf16 operand route's own exactness premise:
    per-step feature spike counts must stay <= 256 (bf16's exact-integer
    range) for the s2 cast to be lossless.  On binary rasters the drive is
    at most the largest positive-weight column sum; after membrane subtract
    the residual is < thr.  The analogue of the quantized route's
    quantized_int8_ok — callers fall back to f32 when it fails rather than
    silently rounding spike counts.

    Memoized per weight buffer (run_model's p50 sampling dispatches ~14
    times per evaluation; the check fetches w_feat to host) and warns ONCE
    per buffer when the premise fails."""
    from lens_tpu.utils.memo import id_memo

    def build() -> bool:
        w = np.asarray(params.w_feat, np.float64)
        drive = float(np.clip(w, 0, None).sum(axis=0).max(initial=0.0))
        ok = 1 + int(drive / max(float(thr_feat), 1e-9)) <= 256
        if not ok:
            import logging

            logging.getLogger("LENS").warning(
                "bf16 route disabled for this model: per-step feature spike "
                "counts can exceed bf16's exact-integer range; using f32"
            )
        return ok

    return id_memo(
        _BF16_OK_CACHE, (params.w_feat,), (float(thr_feat),), build
    )


def init_inference_params(
    n_in: int, n_feat: int, n_out: int, dtype=jnp.float32
) -> LensParams:
    """Zero-initialized inference params (weights come from a checkpoint)."""
    return LensParams(
        w_feat=jnp.zeros((n_in, n_feat), dtype),
        w_out=jnp.zeros((n_feat, n_out), dtype),
        thr_feat=jnp.zeros((n_feat,), dtype),
        thr_out=jnp.zeros((n_out,), dtype),
    )


def params_from_numpy(
    w_feat: np.ndarray, w_out: np.ndarray, thr_feat: np.ndarray, thr_out: np.ndarray
) -> LensParams:
    return LensParams(
        w_feat=jnp.asarray(w_feat, jnp.float32),
        w_out=jnp.asarray(w_out, jnp.float32),
        thr_feat=jnp.asarray(thr_feat, jnp.float32).reshape(-1),
        thr_out=jnp.asarray(thr_out, jnp.float32).reshape(-1),
    )
