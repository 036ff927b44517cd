"""Fully-fused Pallas TPU kernel for the spiking inference forward.

The XLA stepwise scan costs ~17 us per timestep in per-op dispatch for ops
that need ~0.2 us of MXU time (the GEMMs are 100x200 and 200x100).  This
kernel runs the ENTIRE pipeline — Bernoulli raster, both GEMMs, both IAF
recurrences, spike-count accumulation over all T timesteps — inside one
`pallas_call`: weights, the shared threshold tensor U, membranes, and the
query tile all live in VMEM (~3 MB at tile 1024), so the T-loop touches HBM
exactly twice (tile in, counts out).

Semantics identical to core/network.py forward_counts: multi-spike IAF,
membrane-subtract reset, min_v_mem floor (sinabs defaults — reference
run_model.py:149-156), input IAF elided as the exact identity it is on
binary rasters at threshold 1.

Padding contract (TPU lane alignment): inputs are zero-padded to multiples
of 128 lanes; U pads with 1.0 so padded pixels never spike (u < intensity is
false for u=1, i=0); padded weight rows/cols are zero, so padded membranes
stay at 0 forever and the (Q, n_out) slice of the output is exact.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lens_tpu.core.network import LensParams, SpikeThresholds


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _spikes(
    v: jnp.ndarray,
    thr: float,
    int_exact: bool = False,
    recip: Optional[float] = None,
) -> jnp.ndarray:
    """Multi-spike count: floor(v/thr) clamped at 0.

    Default (float path): the literal divide.  At thr == 1.0 it folds at
    compile time and the traced HLO stays byte-identical to the proven
    cached executable.  (A thr==1.0 divide-elision specialization was tried
    in round 2 and produced a fresh HLO whose remote compile wedged.)

    recip (the quantized chip route's fast path): a pre-VERIFIED f32
    multiplier m with max(floor(v*m), 0) == max(floor(v/thr), 0) for every
    integer v in the model's membrane envelope (speck_sim.verified_recip
    proves this exhaustively on the host at discretize time — the multiplier
    is only passed when the proof holds).  One multiply + floor + max: the
    same VPU pass count as the float path, no correction arithmetic.

    int_exact=True without recip (fallback when no verified multiplier
    exists): multiply-by-reciprocal plus a +/-1 correction — exact for the
    quantized envelope: with v/thr < 2^23 the relative error of v*fl(1/thr)
    keeps floor within +/-1 of true, and the remainder r = v - s0*thr is an
    exact f32 integer (products/sums < 2^24), so the comparison correction
    recovers floor(v/thr) exactly.  For v < 0 the corrected floor is <= -1
    and clamps to 0, matching the divide.  NOT valid for non-integer v/thr
    (boundary rounding could differ from the divide) — the float path never
    uses it.  Fuzzed bit-exact against the int32 scan in
    tests/test_speck_sim.py (including engineered exact-multiple ties)."""
    if recip is not None:
        if thr == 1.0 or recip == 1.0:
            # Exact identity — elide the multiply entirely.  Measured round
            # 4: the VPU divide is multi-cycle even by the constant 1.0
            # (quant kernel with verified recips ran 1.8x the float kernel
            # in the same bench run), so the float route passes recip=1.0
            # to take this branch.
            return jnp.maximum(jnp.floor(v), 0.0)
        return jnp.maximum(jnp.floor(v * np.float32(recip)), 0.0)
    if not int_exact or thr == 1.0:
        return jnp.maximum(jnp.floor(v / thr), 0.0)
    inv = np.float32(1.0) / np.float32(thr)  # f32 reciprocal, baked constant
    s0 = jnp.floor(v * inv)
    r = v - s0 * thr
    s = s0 + (r >= thr).astype(jnp.float32) - (r < 0.0).astype(jnp.float32)
    return jnp.maximum(s, 0.0)


def _kernel(
    thr_feat: float,
    thr_out: float,
    min_v: Optional[float],
    min_v_out: Optional[float] = None,
    int_exact: bool = False,
    recip_feat: Optional[float] = None,
    recip_out: Optional[float] = None,
):
    if min_v_out is None:
        min_v_out = min_v
    # Note: an explicitly software-pipelined variant (compute the
    # state-independent GEMM1 one step ahead behind a lax.cond) was measured
    # SLOWER (220k vs 255k frames/s) — Mosaic already schedules the
    # independent dot; the cond only adds overhead.  Keep the straight loop.
    def kernel(intens_ref, u_ref, w1_ref, w2_ref, out_ref):
        t_steps = u_ref.shape[0]
        q = intens_ref.shape[0]
        n_feat = w1_ref.shape[1]
        n_out = w2_ref.shape[1]
        intens = intens_ref[:]
        w1 = w1_ref[:]
        w2 = w2_ref[:]

        def body(t, carry):
            v2, v3, acc = carry
            u_t = u_ref[t, :]
            x = (u_t[None, :] < intens).astype(jnp.float32)
            h = jnp.dot(x, w1, preferred_element_type=jnp.float32)
            v2 = v2 + h
            s2 = _spikes(v2, thr_feat, int_exact, recip_feat)
            v2 = v2 - s2 * thr_feat
            if min_v is not None:
                v2 = jnp.maximum(v2, min_v)
            h2 = jnp.dot(s2, w2, preferred_element_type=jnp.float32)
            v3 = v3 + h2
            s3 = _spikes(v3, thr_out, int_exact, recip_out)
            v3 = v3 - s3 * thr_out
            if min_v_out is not None:
                v3 = jnp.maximum(v3, min_v_out)
            return v2, v3, acc + s3

        init = (
            jnp.zeros((q, n_feat), jnp.float32),
            jnp.zeros((q, n_out), jnp.float32),
            jnp.zeros((q, n_out), jnp.float32),
        )
        _, _, acc = jax.lax.fori_loop(0, t_steps, body, init)
        out_ref[:] = acc

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "spike_thresholds", "min_v_mem", "min_v_mem_out", "tile_q", "interpret",
        "int_exact", "recip_feat", "recip_out",
    ),
)
def forward_counts_pallas(
    params: LensParams,
    intensities: jnp.ndarray,  # (Q, n_in) float32 in [0,1]
    u_thresh: jnp.ndarray,  # (T, n_in)
    spike_thresholds: SpikeThresholds = SpikeThresholds(),
    min_v_mem: Optional[float] = -1.0,
    tile_q: int = 1024,
    interpret: bool = False,
    min_v_mem_out: Optional[float] = None,  # None = same floor as layer 1
    int_exact: bool = False,  # quantized route: reciprocal spike count
    recip_feat: Optional[float] = None,  # host-verified exact multipliers
    recip_out: Optional[float] = None,  # (speck_sim.verified_recip)
) -> jnp.ndarray:
    """(Q, n_out) output spike counts; drop-in for forward_counts.

    Requires the input-IAF threshold to be 1.0 (the identity elision); the
    orchestrator routes other configurations to the scan path.  A separate
    `min_v_mem_out` supports the quantized chip path, where each layer's
    membrane floor is scaled by its own discretization factor.
    """
    assert spike_thresholds.inp == 1.0, "input IAF elision needs threshold 1"
    # Float-route divide elision: at threshold 1.0, floor(v/1.0) == floor(v)
    # exactly, and the VPU divide is multi-cycle even by the constant 1.0
    # (round 4: the quantized kernel with verified reciprocals measured 1.8x
    # the divide-based float kernel in one bench run).  Only exact-identity
    # cases take this path; non-unit float thresholds keep the true divide.
    if recip_feat is None and spike_thresholds.feat == 1.0:
        recip_feat = 1.0
    if recip_out is None and spike_thresholds.out == 1.0:
        recip_out = 1.0
    q, n_in = intensities.shape
    t_steps = u_thresh.shape[0]
    n_feat = params.w_feat.shape[1]
    n_out = params.w_out.shape[1]

    n_in_p = _round_up(n_in, 128)
    n_feat_p = _round_up(n_feat, 128)
    n_out_p = _round_up(n_out, 128)
    # Bucket the query count to whole tiles: one compiled kernel per grid
    # size instead of one per dataset size (remote TPU compiles are minutes).
    q_p = _round_up(q, tile_q)

    intens_p = jnp.zeros((q_p, n_in_p), jnp.float32)
    intens_p = intens_p.at[:q, :n_in].set(intensities.astype(jnp.float32))
    u_p = jnp.ones((t_steps, n_in_p), jnp.float32)  # pad=1.0 => never spikes
    u_p = u_p.at[:, :n_in].set(u_thresh.astype(jnp.float32))
    w1_p = jnp.zeros((n_in_p, n_feat_p), jnp.float32)
    w1_p = w1_p.at[:n_in, :n_feat].set(params.w_feat.astype(jnp.float32))
    w2_p = jnp.zeros((n_feat_p, n_out_p), jnp.float32)
    w2_p = w2_p.at[:n_feat, :n_out].set(params.w_out.astype(jnp.float32))

    grid = (q_p // tile_q,)
    out = pl.pallas_call(
        _kernel(
            float(spike_thresholds.feat),
            float(spike_thresholds.out),
            None if min_v_mem is None else float(min_v_mem),
            None if min_v_mem_out is None else float(min_v_mem_out),
            int_exact,
            recip_feat,
            recip_out,
        ),
        out_shape=jax.ShapeDtypeStruct((q_p, n_out_p), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, n_in_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_steps, n_in_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_in_p, n_feat_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_feat_p, n_out_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_q, n_out_p), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * t_steps * q_p * (n_in_p * n_feat_p + n_feat_p * n_out_p),
            bytes_accessed=4 * (q_p * n_in_p + t_steps * n_in_p + q_p * n_out_p),
            transcendentals=0,
        ),
        interpret=interpret,
    )(intens_p, u_p, w1_p, w2_p)
    return out[:q, :n_out]


def pallas_available() -> bool:
    """True when the default backend can run this kernel.  The kernel is
    TPU-Mosaic specific (pltpu.VMEM BlockSpecs), so only the TPU backend
    qualifies — on GPU/CPU the XLA scan path is the correct route.  The
    tunneled TPU backend here reports as 'axon'."""
    return jax.default_backend() in ("tpu", "axon")


def cpu_q_bucket(q: int) -> int:
    """Query bucket for the CPU backend: next power of two >= q (min 32).
    On CPU padded rows run the full scan for real and compiles are cheap,
    so a tight bucket beats the TPU's fixed 1024 (where padded rows are
    nearly free on the MXU and each compile costs minutes)."""
    return 1 << max(5, (q - 1).bit_length())


# VMEM budget for the fused kernel's resident set.  The chip has 128 MiB of
# VMEM; the kernel holds both weight banks, the threshold stream, and the
# per-tile intensity/membrane/output buffers resident (that residency IS the
# kernel's speedup), and Mosaic needs headroom for register spills — the
# large-model failure mode was "Used 183.91M of 128.00M vmem" with a 101 MB
# spill allocation.  Models past this budget route to the XLA scan, where
# the compiler tiles the GEMMs through HBM.
_PALLAS_VMEM_BUDGET_BYTES = 64 * 1024 * 1024


def kernel_vmem_bytes(
    n_in: int, n_feat: int, n_out: int, t_steps: int, tile_q: int
) -> int:
    """f32 resident-set estimate of forward_counts_pallas (padded to the
    128-lane tile): weights + threshold stream + per-tile buffers."""
    pad = lambda n: -(-n // 128) * 128  # noqa: E731
    n_in_p, n_feat_p, n_out_p = pad(n_in), pad(n_feat), pad(n_out)
    return 4 * (
        n_in_p * n_feat_p  # w1
        + n_feat_p * n_out_p  # w2
        + t_steps * n_in_p  # u
        + tile_q * (n_in_p + n_feat_p + 2 * n_out_p)  # intens + v2 + v3 + out
    )


def best_forward(params, intensities, u_thresh, spike_thresholds=SpikeThresholds(),
                 min_v_mem=-1.0, q_bucket: int = 1024, matmul_dtype=None):
    """Route to the Pallas kernel on TPU, the XLA scan elsewhere.

    The query axis is host-padded up to a multiple of `q_bucket` so every
    dataset size reuses the same compiled executable (remote TPU compiles
    cost minutes; padded rows are all-zero intensities, which never spike).
    Models whose weights do not fit the kernel's VMEM-resident design
    (kernel_vmem_bytes > budget) take the XLA scan, which tiles through HBM.

    `matmul_dtype` (the --precision bf16 route) forces the scan path — the
    fused kernel is VMEM-bandwidth bound, not MXU bound, so bf16 operands
    target the GEMM-bound scan-route models — with the same query-bucket
    padding discipline (backend-aware on CPU, where padded rows run for
    real and compiles are cheap).  When the model violates bf16's own
    exactness premise (per-step feature spikes past bf16's exact-integer
    range — network.bf16_matmul_exact_ok), the route falls back to f32 with
    a warning rather than silently rounding spike counts.
    """
    from lens_tpu.core.network import bf16_matmul_exact_ok, forward_counts

    if matmul_dtype is not None and not bf16_matmul_exact_ok(
        params, spike_thresholds.feat
    ):
        matmul_dtype = None  # exactness first (the gate warns once)

    q = intensities.shape[0]
    fits = kernel_vmem_bytes(
        intensities.shape[1],
        params.w_feat.shape[1],
        params.w_out.shape[1],
        u_thresh.shape[0],
        q_bucket,
    ) <= _PALLAS_VMEM_BUDGET_BYTES
    use_pallas = (
        pallas_available()
        and spike_thresholds.inp == 1.0
        and fits
        and matmul_dtype is None
    )
    if not use_pallas:
        if jax.default_backend() == "cpu":
            q_bucket = cpu_q_bucket(q)
        q_p = _round_up(q, q_bucket)
        if q_p != q:
            intensities = jnp.zeros(
                (q_p, intensities.shape[1]), jnp.float32
            ).at[:q].set(intensities)
        out = forward_counts(
            params, intensities, u_thresh, spike_thresholds, min_v_mem,
            matmul_dtype=matmul_dtype,
        )
        return out[:q]
    # No pre-pad here: forward_counts_pallas buckets the query axis to the
    # same tile_q itself (a second zeros+scatter would be pure overhead on
    # the hot path).
    out = forward_counts_pallas(
        params, intensities, u_thresh, spike_thresholds, min_v_mem, tile_q=q_bucket
    )
    return out[:q]
