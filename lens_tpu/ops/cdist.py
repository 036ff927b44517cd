"""Chunked L1 pairwise distance on device (reference sad.py:38 torch.cdist).

A full (Q, R, P) broadcast would materialize Q*R*P floats in HBM; we scan over
query chunks so the working set stays small while each chunk's reduction is a
single fused XLA op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("chunk",))
def l1_cdist(a: jnp.ndarray, b: jnp.ndarray, chunk: int = 16) -> jnp.ndarray:
    """(Q, P) x (R, P) -> (Q, R) sum-of-absolute-differences."""
    q = a.shape[0]
    pad = (-q) % chunk
    a_pad = jnp.pad(a, ((0, pad), (0, 0)))
    blocks = a_pad.reshape(-1, chunk, a.shape[1])

    def one(block):
        return jnp.abs(block[:, None, :] - b[None, :, :]).sum(axis=-1)

    out = jax.lax.map(one, blocks).reshape(-1, b.shape[0])
    return out[:q]
