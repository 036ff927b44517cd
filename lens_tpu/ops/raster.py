"""Bernoulli spike rasterization.

The reference rasterizes each query with `torch.manual_seed(50);
(torch.rand(T, *img.shape) < img).float()` (dataset.py:118-126).  Because the
seed is reset *per item*, every query shares one identical uniform threshold
tensor U of shape (T, n_pixels).  We exploit that: generate U once, keep it on
device, and rasterize all queries with a single broadcast compare
`spikes[t, q, p] = U[t, p] < intensity[q, p]` inside the jitted program.

Two threshold sources:
  - 'torch-parity': reproduce the reference's exact Philox stream via the CPU
    torch wheel (bitwise-identical rasters, hence bitwise-identical spike
    counts on the float path).  torch is only ever imported here and in the
    .pth checkpoint converter — never in the compute path.
  - 'jax': native JAX PRNG (threefry), statistically equivalent.
"""

from __future__ import annotations

import numpy as np


def torch_parity_thresholds(time_window: int, n_pixels: int, seed: int = 50) -> np.ndarray:
    """(T, n_pixels) float32 uniforms matching torch.manual_seed(seed);
    torch.rand(T, n_pixels) — the reference raster stream (dataset.py:120-121)."""
    import torch  # local import: optional parity dependency

    torch.manual_seed(seed)
    return torch.rand(time_window, n_pixels).numpy()


def jax_thresholds(time_window: int, n_pixels: int, seed: int = 50) -> np.ndarray:
    """(T, n_pixels) float32 uniforms from the JAX PRNG."""
    import jax

    key = jax.random.PRNGKey(seed)
    return np.asarray(
        jax.random.uniform(key, (time_window, n_pixels), dtype=np.float32)
    )


def make_thresholds(
    mode: str, time_window: int, n_pixels: int, seed: int = 50
) -> np.ndarray:
    if mode == "torch-parity":
        try:
            return torch_parity_thresholds(time_window, n_pixels, seed)
        except ImportError:
            import logging

            logging.getLogger("LENS").warning(
                "torch unavailable: raster parity degrades to statistical "
                "(JAX PRNG) equivalence"
            )
            return jax_thresholds(time_window, n_pixels, seed)
    if mode == "jax":
        return jax_thresholds(time_window, n_pixels, seed)
    raise ValueError(f"unknown raster mode: {mode!r}")
