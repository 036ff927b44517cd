"""Streamed IAF-scan Pallas kernels — EXPERIMENTAL, NOT ROUTED.

No production path dispatches here: measured end-to-end on the v5e chip,
these kernels are SLOWER than the XLA `lax.scan` they were built to replace
(BENCHMARKS.md records the negative — XLA already keeps the hoisted scan's
carries effectively resident at these widths, so the kernel's extra
grid/DMA bookkeeping is pure overhead).  The module is kept because its
interpret-mode tests pin the verified-reciprocal spike-count contract
independently of the fused kernel, and because the VMEM-resident-scan
recipe applies if a future model scale breaks XLA's fusion.  Wire-in, if
ever, belongs behind `iaf_kernels_vmem_ok` + the exactness gates in
speck_sim's int8 route.

The design it explores: the hoisted forward (core/network.forward_counts, speck_sim's int8 route)
computes each layer's drive as ONE big MXU GEMM and leaves only the
elementwise IAF recurrence in a `lax.scan`.  At production scale that scan
is the remaining bottleneck — NOT for its arithmetic but for its carry
traffic: XLA materializes the (Q, N) membrane (and count accumulator)
through HBM every step, so the IN1024/FN2048/DB8192 output scan moves
~40 MB/step x 250 steps ≈ 10 GB per batch (~10.6 ms measured of the int8
route's 25 ms).

These kernels keep the carries VMEM-RESIDENT: grid = (N-blocks, T) — the
time axis is the innermost (sequential) grid dimension, the drive tensor
streams through VMEM one (Q, block) tile per step (Pallas double-buffers
the DMA), and the membrane/accumulator live in VMEM scratch that persists
across the T iterations of each block (re-initialized at t == 0).  HBM
traffic drops to reading the drive once (+ writing spikes/counts once).

Semantics are exactly `core.iaf.iaf_step` in f32 (multi-spike, membrane
subtract, min_v floor), with the spike count computed per `_spikes`'
verified-reciprocal contract: `recip` None = true divide, 1.0 = floor
elision, else multiply by a host-PROVEN exact reciprocal.  Integer routes
pass integer-valued f32 drives (exact below 2^24 — the envelope the
quantized dispatcher already gates on) and get bit-identical integer
results back (fuzzed in tests/test_iaf_kernels.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lens_tpu.ops.fused_forward import _round_up, _spikes


def _step(v, h_t, thr, min_v, recip, int_exact):
    """One IAF update on f32 values; returns (new_v, spikes)."""
    v = v + h_t
    s = _spikes(v, thr, int_exact, recip)
    v = v - s * thr
    if min_v is not None:
        v = jnp.maximum(v, min_v)
    return v, s


def _counts_kernel(n_tc, block_t, thr, min_v, recip, int_exact):
    """Time-blocked: each grid step DMAs a (block_t, Q, block_n) drive chunk
    (one large transfer — single-step blocks measured 6x below bandwidth)
    and runs block_t IAF updates from VMEM."""

    def kernel(h_ref, out_ref, v_ref, acc_ref):
        tc = pl.program_id(1)

        @pl.when(tc == 0)
        def _init():
            v_ref[:] = jnp.zeros_like(v_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        def body(k, carry):
            v, acc = carry
            v, s = _step(v, h_ref[k], thr, min_v, recip, int_exact)
            return v, acc + s

        v, acc = jax.lax.fori_loop(0, block_t, body, (v_ref[:], acc_ref[:]))
        v_ref[:] = v
        acc_ref[:] = acc

        @pl.when(tc == n_tc - 1)
        def _emit():
            out_ref[:] = acc_ref[:]

    return kernel


def _spikes_kernel(block_t, thr, min_v, recip, int_exact):
    def kernel(h_ref, out_ref, v_ref):
        tc = pl.program_id(1)

        @pl.when(tc == 0)
        def _init():
            v_ref[:] = jnp.zeros_like(v_ref)

        def body(k, v):
            v, s = _step(v, h_ref[k], thr, min_v, recip, int_exact)
            out_ref[k] = s
            return v

        v_ref[:] = jax.lax.fori_loop(0, block_t, body, v_ref[:])

    return kernel


def _common(h, block_n, block_t):
    t_steps, q, n = h.shape
    n_p = _round_up(n, 128)
    block_n = min(block_n, n_p)
    if n_p % block_n:
        block_n = n_p  # fall back to one block rather than ragged tiling
    block_t = min(block_t, t_steps)
    t_p = _round_up(t_steps, block_t)
    pads = ((0, t_p - t_steps), (0, 0), (0, n_p - n))
    if t_p != t_steps or n_p != n:
        # Zero-drive padding steps are inert: after membrane subtract the
        # residual is < thr, so zero drive fires nothing and counts are
        # unchanged (min_v floor is idempotent).
        h = jnp.pad(h, pads)
    return h, t_steps, t_p, q, n, n_p, block_n, block_t


@functools.partial(
    jax.jit,
    static_argnames=(
        "thr", "min_v", "recip", "int_exact", "block_n", "block_t", "interpret",
    ),
)
def iaf_seq_counts(
    h: jnp.ndarray,  # (T, Q, N) f32 drives (integer-valued for int routes)
    thr: float,
    min_v: Optional[float],
    recip: Optional[float] = None,
    int_exact: bool = False,
    block_n: int = 1024,
    block_t: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """(Q, N) f32 total spike counts of the IAF recurrence over T drives,
    with VMEM-resident membrane/accumulator (see module docstring)."""
    h, t_steps, t_p, q, n, n_p, block_n, block_t = _common(h, block_n, block_t)
    grid = (n_p // block_n, t_p // block_t)
    out = pl.pallas_call(
        _counts_kernel(
            t_p // block_t, block_t, float(thr), min_v, recip, int_exact
        ),
        out_shape=jax.ShapeDtypeStruct((q, n_p), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_t, q, block_n),
                lambda j, tc: (tc, 0, j),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (q, block_n), lambda j, tc: (0, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((q, block_n), jnp.float32),  # membrane
            pltpu.VMEM((q, block_n), jnp.float32),  # count accumulator
        ],
        interpret=interpret,
    )(h.astype(jnp.float32))
    return out[:, :n]


@functools.partial(
    jax.jit,
    static_argnames=(
        "thr", "min_v", "recip", "int_exact", "block_n", "block_t", "interpret",
    ),
)
def iaf_seq_spikes(
    h: jnp.ndarray,  # (T, Q, N) f32 drives
    thr: float,
    min_v: Optional[float],
    recip: Optional[float] = None,
    int_exact: bool = False,
    block_n: int = 1024,
    block_t: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """(T, Q, N) f32 per-step spikes of the IAF recurrence (the feature
    layer's shape — its spikes feed the next GEMM), membrane VMEM-resident."""
    h, t_steps, t_p, q, n, n_p, block_n, block_t = _common(h, block_n, block_t)
    grid = (n_p // block_n, t_p // block_t)
    out = pl.pallas_call(
        _spikes_kernel(block_t, float(thr), min_v, recip, int_exact),
        out_shape=jax.ShapeDtypeStruct((t_p, q, n_p), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_t, q, block_n),
                lambda j, tc: (tc, 0, j),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (block_t, q, block_n), lambda j, tc: (tc, 0, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((q, block_n), jnp.float32)],
        interpret=interpret,
    )(h.astype(jnp.float32))
    return out[:t_steps, :, :n]


def iaf_kernels_vmem_ok(q: int, block_n: int = 1024, block_t: int = 8) -> bool:
    """Conservative residency check: double-buffered h tiles (in and, for
    the spikes kernel, out) + carry scratch must fit comfortably in VMEM."""
    tile = 4 * block_t * q * block_n
    bytes_needed = 4 * tile + 2 * 4 * q * block_n  # 2x in + 2x out + v + acc
    return bytes_needed <= 64 * 1024 * 1024
