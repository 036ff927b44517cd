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


def trim_rows(out: jnp.ndarray, q: int) -> jnp.ndarray:
    """Drop query-bucket padding rows — but elide the IDENTITY slice:
    out[:q] with q == out.shape[0] still goes through jnp's gather rewrite
    and dispatches a device slice executable per call (~0.2 ms host on the
    relay; the Q=1024 headline is host-dispatch-bound — BENCHMARKS.md
    dispatch-cost note).  Every dispatcher return uses this helper so the
    idiom cannot silently regress."""
    return out if out.shape[0] == q else out[:q]


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
    op_dtype=jnp.float32,
    out_block: Optional[int] = None,
):
    if min_v_out is None:
        min_v_out = min_v
    # Note: an explicitly software-pipelined variant (compute the
    # state-independent GEMM1 one step ahead behind a lax.cond) was measured
    # SLOWER (220k vs 255k frames/s) — Mosaic already schedules the
    # independent dot; the cond only adds overhead.  Keep the straight loop.
    #
    # op_dtype != f32 (the bf16 large-model route): the weight refs arrive
    # already cast, rasters are exactly {0,1} and per-step feature spike
    # counts are gated <= 256 (network.bf16_matmul_exact_ok), so both MXU
    # operands are lossless in bf16; accumulation, membranes, and counts
    # stay f32 — identical semantics to forward_counts(matmul_dtype=bf16).
    # out_block (the large-model slab variant): loading the whole w2 as a
    # value (`w2_ref[:]`) makes the register allocator keep the full array
    # live across the T-loop and SPILL it — measured on v5e at
    # IN1024/FN2048/DB8192: a ~106 MB scoped floor that no query-tile size
    # can shrink (140.4M scoped at tile_q=256, 114.8M at 64; hardware VMEM
    # is 128M).  The slab form never materializes w2 as a value: GEMM2 runs
    # over static out-column slabs read from the ref per step, and the
    # output membranes/counts live in VMEM *scratch refs* updated slab by
    # slab, so the vreg live set per iteration is one (2048, out_block)
    # slab + (tile_q, out_block) f32 temporaries.
    if out_block is not None:

        def kernel(intens_ref, u_ref, w1_ref, w2_ref, out_ref, v2_ref, v3_ref):
            t_steps = u_ref.shape[0]
            n_out = w2_ref.shape[1]
            # Static slab boundaries with a RAGGED final slab: n_out only
            # pads to the 128-lane tile, never up to an out_block multiple
            # (padding 1100 -> 2048 would nearly double GEMM2 and make the
            # VMEM fit estimate diverge from the dispatched kernel).
            n_slabs = -(-n_out // out_block)
            v2_ref[:] = jnp.zeros_like(v2_ref)
            v3_ref[:] = jnp.zeros_like(v3_ref)
            out_ref[:] = jnp.zeros_like(out_ref)

            def body(t, _):
                # Window reads INSIDE the body: values die each iteration
                # instead of living across the T-loop as spilled vregs.
                u_t = u_ref[t, :]
                x = (u_t[None, :] < intens_ref[:]).astype(op_dtype)
                h = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
                v2 = v2_ref[:] + h
                s2 = _spikes(v2, thr_feat, int_exact, recip_feat)
                v2 = v2 - s2 * thr_feat
                if min_v is not None:
                    v2 = jnp.maximum(v2, min_v)
                v2_ref[:] = v2
                s2c = s2.astype(op_dtype)
                for j in range(n_slabs):  # static slices: unrolled, tiny J
                    sl = slice(j * out_block, min((j + 1) * out_block, n_out))
                    h2 = jnp.dot(
                        s2c, w2_ref[:, sl], preferred_element_type=jnp.float32
                    )
                    v3 = v3_ref[:, sl] + h2
                    s3 = _spikes(v3, thr_out, int_exact, recip_out)
                    v3 = v3 - s3 * thr_out
                    if min_v_out is not None:
                        v3 = jnp.maximum(v3, min_v_out)
                    v3_ref[:, sl] = v3
                    out_ref[:, sl] += s3
                return 0

            jax.lax.fori_loop(0, t_steps, body, 0)

        return kernel

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
            x = (u_t[None, :] < intens).astype(op_dtype)
            h = jnp.dot(x, w1, preferred_element_type=jnp.float32)
            v2 = v2 + h
            s2 = _spikes(v2, thr_feat, int_exact, recip_feat)
            v2 = v2 - s2 * thr_feat
            if min_v is not None:
                v2 = jnp.maximum(v2, min_v)
            h2 = jnp.dot(s2.astype(op_dtype), w2, preferred_element_type=jnp.float32)
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
        "int_exact", "recip_feat", "recip_out", "matmul_dtype", "out_block",
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
    matmul_dtype=None,  # bf16 large-model route: MXU operands only
    out_block: Optional[int] = None,  # large-model slab variant (see _kernel)
) -> jnp.ndarray:
    """(Q, n_out) output spike counts; drop-in for forward_counts.

    Requires the input-IAF threshold to be 1.0 (the identity elision); the
    orchestrator routes other configurations to the scan path.  A separate
    `min_v_mem_out` supports the quantized chip path, where each layer's
    membrane floor is scaled by its own discretization factor.

    `matmul_dtype=jnp.bfloat16` halves the VMEM-resident weight banks and
    feeds the MXU its native operand format — the route for models whose f32
    weights blow the VMEM budget (the scan path's alternative materializes
    (T*Q, n) activations through HBM).  Semantics match
    forward_counts(matmul_dtype=bf16): weights bf16-rounded once, rasters
    and spike counts lossless, accumulation f32.
    """
    assert spike_thresholds.inp == 1.0, "input IAF elision needs threshold 1"
    assert out_block is None or out_block % 128 == 0, "slab = whole lanes"
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
    # 128 lanes only — the slab kernel handles a ragged final slab with
    # static shapes, so n_out never pads up to an out_block multiple and
    # kernel_vmem_bytes' estimate matches the kernel it gates.
    n_out_p = _round_up(n_out, 128)
    # Bucket the query count to whole tiles: one compiled kernel per grid
    # size instead of one per dataset size (remote TPU compiles are minutes).
    q_p = _round_up(q, tile_q)

    op_dtype = jnp.float32 if matmul_dtype is None else jnp.dtype(matmul_dtype)
    intens_p = jnp.zeros((q_p, n_in_p), jnp.float32)
    intens_p = intens_p.at[:q, :n_in].set(intensities.astype(jnp.float32))
    u_p = jnp.ones((t_steps, n_in_p), jnp.float32)  # pad=1.0 => never spikes
    u_p = u_p.at[:, :n_in].set(u_thresh.astype(jnp.float32))
    w1_p = jnp.zeros((n_in_p, n_feat_p), op_dtype)
    w1_p = w1_p.at[:n_in, :n_feat].set(params.w_feat.astype(op_dtype))
    w2_p = jnp.zeros((n_feat_p, n_out_p), op_dtype)
    w2_p = w2_p.at[:n_feat, :n_out].set(params.w_out.astype(op_dtype))

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
            op_dtype,
            out_block,
        ),
        out_shape=jax.ShapeDtypeStruct((q_p, n_out_p), jnp.float32),
        grid=grid,
        # Slab variant: membranes live in VMEM scratch refs, not vregs (the
        # whole point — see _kernel's out_block note).
        scratch_shapes=(
            [
                pltpu.VMEM((tile_q, n_feat_p), jnp.float32),
                pltpu.VMEM((tile_q, n_out_p), jnp.float32),
            ]
            if out_block is not None
            else []
        ),
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
        # The VMEM-resident design IS the kernel (weights + threshold stream
        # + membranes live in VMEM for all T steps); at large model scale
        # that exceeds the compiler's default 16 MiB scoped-vmem cap
        # ("Scoped allocation ... exceeded scoped vmem limit"), so raise
        # the cap — but only for models that need it, keeping small-model
        # HLOs unchanged.
        compiler_params=(
            pltpu.CompilerParams(
                # The slab variant's windows+scratch alone can approach the
                # 88 MiB routing budget; give Mosaic the rest of the chip
                # for temporaries.  The value-resident form keeps the lower
                # cap (its overrun mode is whole-weight-bank spills, better
                # rejected at compile time than thrashing).
                vmem_limit_bytes=(120 if out_block is not None else 100)
                * 1024 * 1024
            )
            if kernel_vmem_bytes(
                n_in, n_feat, n_out, t_steps, tile_q,
                weight_bytes=jnp.dtype(op_dtype).itemsize,
            ) > 14 * 1024 * 1024
            else None
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

# The small-model classification bound for PRECISION routing (see
# _f32_value_class).  Historically this gated the value-form kernel: w2 held
# as a vreg VALUE across the T-loop spills to scoped VMEM in unpacked form
# (measured on v5e at IN1024/FN2048/DB8192 bf16: a ~106 MB scoped floor that
# no query-tile size shrinks), so larger w2 required the slab form.  The
# round-5 A/B then showed the slab form is FASTER at every scale, so it is
# now the routed form everywhere and this bound only classifies "small".
_W2_VALUE_BYTES_MAX = 4 * 1024 * 1024

# Slab GEMM2 width.  v5e sweep at IN1024/FN2048/DB8192 bf16 tile_q=512:
# out_block 512 -> 81.0% MFU, 1024 -> 81.4%, 2048 -> 81.5%; at tile_q=256:
# 512 -> 40.2%, 1024 -> 72.6% (narrow slabs starve the MXU on the
# (tile_q, n_feat) x (n_feat, out_block) step).  1024 takes ~all of the win
# at half 2048's slab VMEM.  Query-tile sweep at out_block=1024: tile_q
# 512 -> 81.4%, 768 -> 88.1%, 896 -> 88.2% (flat) — callers with deep query
# batches get the plateau by bucketing at 768.
_SLAB_OUT_BLOCK = 1024

# Budget for the slab variant: the estimate below counts the kernel's VMEM
# windows + scratch, and slab spills are small (per-iteration values only),
# so the gate can run much closer to the 128 MiB chip than the value-resident
# kernel's 64 MiB (which must absorb whole-weight-bank spills).  Measured on
# v5e at IN1024/FN2048/DB8192 bf16: tile_q=512 (77 MiB estimated), 768
# (98.5 MiB), and 896 (105 MiB) all compile and run inside the 120 MiB
# Mosaic cap — the MFU plateau is at 768 (88.1%, vs 81.9% at 512).
_PALLAS_SLAB_VMEM_BUDGET_BYTES = 106 * 1024 * 1024


def kernel_vmem_bytes(
    n_in: int, n_feat: int, n_out: int, t_steps: int, tile_q: int,
    weight_bytes: int = 4,
) -> int:
    """Resident-set estimate of forward_counts_pallas (padded to the
    128-lane tile): weights + threshold stream + per-tile buffers.
    `weight_bytes=2` sizes the bf16-operand variant, whose weight banks are
    half-width (membranes/counts stay f32)."""
    n_in_p = _round_up(n_in, 128)
    n_feat_p = _round_up(n_feat, 128)
    n_out_p = _round_up(n_out, 128)
    return weight_bytes * (
        n_in_p * n_feat_p  # w1
        + n_feat_p * n_out_p  # w2
    ) + 4 * (
        t_steps * n_in_p  # u
        + tile_q * (n_in_p + n_feat_p + 2 * n_out_p)  # intens + v2 + v3 + out
    )


def _route_plan(
    n_in: int, n_feat: int, n_out: int, t_steps: int, tile_q: int,
    op_bytes: int,
) -> tuple:
    """(fits, out_block) for one MXU operand width.

    The SLAB form is the routed form at every scale (round-5 interleaved
    A/B on v5e: headline model 596k vs the carry-vreg value form's 511k
    frames/s at Q=1024, 1061k vs 699k at Q=4096, and the value form could
    not compile at all past ~4 MB of w2 — scratch-ref membranes beat
    loop-carried vregs everywhere measured).  The value form remains
    reachable via an explicit out_block=None for A/B tests."""
    out_block = min(_SLAB_OUT_BLOCK, _round_up(n_out, 128))
    fits = (
        kernel_vmem_bytes(n_in, n_feat, n_out, t_steps, tile_q,
                          weight_bytes=op_bytes)
        <= _PALLAS_SLAB_VMEM_BUDGET_BYTES
    )
    return fits, out_block


def _f32_value_class(
    n_in: int, n_feat: int, n_out: int, t_steps: int, tile_q: int,
) -> bool:
    """The small-model class (w2 within the old value-form bound and the
    whole f32 resident set inside the conservative budget).  Used for
    PRECISION routing only: these models are VMEM/VPU-bound in the fused
    kernel, so a bf16 ask keeps the measured scan route (bf16 operands buy
    nothing and would change the bf16 contract's accumulation order), and
    the quantized dispatcher prefers f32 over bf16 banks."""
    return (
        _round_up(n_feat, 128) * _round_up(n_out, 128) * 4
        <= _W2_VALUE_BYTES_MAX
        and kernel_vmem_bytes(n_in, n_feat, n_out, t_steps, tile_q)
        <= _PALLAS_VMEM_BUDGET_BYTES
    )


# Query-tile floor for the shrink search below.  Measured on v5e at
# IN1024/FN2048: DB8192 f32 slab at the 256 floor runs 68% MFU-vs-bf16-peak
# (2x the scan's 34-37%) and DB16384 bf16 at 256 runs 81% — a shrunk tile
# keeps the fused kernel far ahead of the scan fallback, while tiles under
# 256 undercut the MXU (the DB8192 bf16 sweep cratered to 40% with an
# ill-matched slab at 256; 128 would be worse than finding a better plan).
_SLAB_TILE_FLOOR = 256


def _fit_tile(
    n_in: int, n_feat: int, n_out: int, t_steps: int, q_bucket: int,
    op_bytes: int,
) -> tuple:
    """(tile_q, out_block) for the largest tile <= q_bucket (halving, down
    to _SLAB_TILE_FLOOR) whose plan fits this operand width's VMEM budget,
    or (None, None).  Lets databases far past one tile's budget (the
    per-tile buffers scale with tile_q * n_out) keep the fused kernel at a
    smaller query tile instead of falling all the way back to the scan.
    A bucket below the floor is its own floor (tiny CPU test buckets); the
    floor itself is always tried (halving from e.g. 768 would skip it)."""
    tq = q_bucket
    floor = min(q_bucket, _SLAB_TILE_FLOOR)
    while True:
        fits, ob = _route_plan(n_in, n_feat, n_out, t_steps, tq, op_bytes)
        if fits:
            return tq, ob
        if tq <= floor:
            return None, None
        tq = max(tq // 2, floor)


def planned_route(
    n_in: int, n_feat: int, n_out: int, t_steps: int, tile_q: int,
    matmul_dtype=None,
) -> str:
    """The program best_forward dispatches for these shapes (assuming the
    backend runs Pallas and the exactness gates pass): 'pallas_slab' or
    'scan'.  Reporting/bench helper — uses the same plan the router
    executes."""
    if not pallas_available():
        return "scan"
    if matmul_dtype is not None:
        if _f32_value_class(n_in, n_feat, n_out, t_steps, tile_q):
            # Small-class models are VMEM/VPU bound in the kernel — bf16
            # buys nothing there, so a bf16 ask keeps the measured scan
            # route (and its accumulation-order contract).
            return "scan"
        op_bytes = jnp.dtype(matmul_dtype).itemsize
    else:
        op_bytes = 4
    tile, _ = _fit_tile(n_in, n_feat, n_out, t_steps, tile_q, op_bytes)
    return "scan" if tile is None else "pallas_slab"


def best_forward(params, intensities, u_thresh, spike_thresholds=SpikeThresholds(),
                 min_v_mem=-1.0, q_bucket: int = 1024, matmul_dtype=None):
    """Route to the Pallas kernel on TPU, the XLA scan elsewhere.

    The query axis is host-padded up to a multiple of the chosen tile so
    every dataset size reuses the same compiled executable (remote TPU
    compiles cost minutes; padded rows are all-zero intensities, which
    never spike).

    Plan (shared with planned_route, which reports it):
      1. Every Pallas dispatch uses the SLAB kernel form (out_block; w2
         stays in its VMEM window — the round-5 A/B showed it beats the
         value form at every scale), searching tile sizes q_bucket,
         q_bucket/2, ... 256 for the largest that fits the slab budget —
         measured 68-88% MFU-vs-bf16-peak across DB8192-16384 vs the
         scan's ~36%.
      2. A bf16 ask on a SMALL-class model (_f32_value_class) keeps the
         measured scan route: those models are VMEM/VPU bound in the
         kernel (bf16 operands buy nothing) and the scan carries the bf16
         contract's accumulation order.
      3. Only models past every tile's budget take the XLA scan, which
         tiles the GEMMs through HBM ((T*Q, n) activation streams).

    When a bf16 ask violates bf16's own exactness premise (per-step
    feature spikes past bf16's exact-integer range —
    network.bf16_matmul_exact_ok), the route falls back to f32 with a
    warning rather than silently rounding spike counts.
    """
    from lens_tpu.core.network import bf16_matmul_exact_ok, forward_counts

    if matmul_dtype is not None and not bf16_matmul_exact_ok(
        params, spike_thresholds.feat
    ):
        matmul_dtype = None  # exactness first (the gate warns once)

    q = intensities.shape[0]
    shapes = (
        intensities.shape[1],
        params.w_feat.shape[1],
        params.w_out.shape[1],
        u_thresh.shape[0],
    )
    pallas_ok = pallas_available() and spike_thresholds.inp == 1.0
    tile = out_block = None
    use_pallas_cast = False
    if pallas_ok:
        if matmul_dtype is None:
            tile, out_block = _fit_tile(*shapes, q_bucket, 4)
        elif not _f32_value_class(*shapes, q_bucket):
            # Not a small-class model — honor the bf16 ask with the fused
            # kernel at the largest tile that fits.
            tile, out_block = _fit_tile(
                *shapes, q_bucket, jnp.dtype(matmul_dtype).itemsize
            )
            use_pallas_cast = tile is not None
    if tile is None:
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
        return trim_rows(out, q)
    # No pre-pad here: forward_counts_pallas buckets the query axis to the
    # same tile_q itself (a second zeros+scatter would be pure overhead on
    # the hot path).
    out = forward_counts_pallas(
        params, intensities, u_thresh, spike_thresholds, min_v_mem,
        tile_q=tile,
        matmul_dtype=matmul_dtype if use_pallas_cast else None,
        out_block=out_block,
    )
    return trim_rows(out, q)
