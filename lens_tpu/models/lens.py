"""The LENS model family: a user-facing facade over the functional core.

The reference exposes its model as four orchestrator classes that each
rebuild the same two-layer network from argparse state (run_model.py:53-101,
train_model.py:41-93, run_speck.py:42-86, collect_data.py:45-88).  Here the
architecture is derived once from `LensConfig` and wrapped in one immutable
object with the operations a user needs: load/save, forward, quantize,
evaluate-style spike counting.

    model = LensModel.from_checkpoint(cfg)
    counts = model.spike_counts(intensities)          # float pipeline
    counts = model.quantized().spike_counts(...)      # chip-accurate ints
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
import numpy as np

from lens_tpu.config import LensConfig
from lens_tpu.core.network import LensParams, SpikeThresholds
from lens_tpu.data.dataset import center_pixel_flat_indices
from lens_tpu.ops.raster import make_thresholds
from lens_tpu.utils import checkpoint


@dataclass(frozen=True)
class LensModel:
    """An inference-ready LENS network bound to its configuration."""

    cfg: LensConfig
    params: LensParams
    spike_thresholds: SpikeThresholds = SpikeThresholds()
    _u_thresh: Optional[np.ndarray] = field(default=None, compare=False)

    # ---- construction ----------------------------------------------------

    @classmethod
    def from_checkpoint(cls, cfg: LensConfig, model_name: Optional[str] = None):
        params = checkpoint.load_model(cfg.models_dir, model_name or cfg.model_name())
        return cls(cfg=cfg, params=params)

    @classmethod
    def from_params(cls, cfg: LensConfig, params: LensParams):
        return cls(cfg=cfg, params=params)

    # ---- persistence -----------------------------------------------------

    def save(self, model_name: Optional[str] = None) -> str:
        return checkpoint.save_model(
            self.cfg.models_dir,
            model_name or self.cfg.model_name(),
            self.params,
            self.cfg.to_json(),
        )

    # ---- derived artifacts ----------------------------------------------

    def raster_thresholds(self) -> np.ndarray:
        """The shared (T, n_in) Bernoulli threshold tensor for this config."""
        if self._u_thresh is not None:
            return self._u_thresh
        cfg = self.cfg
        if cfg.raster_mode == "torch-parity":
            u = make_thresholds(
                "torch-parity", cfg.timebin, cfg.roi_dim * cfg.roi_dim, cfg.raster_seed
            )[:, center_pixel_flat_indices(cfg.roi_dim, cfg.dims)]
        else:
            u = make_thresholds("jax", cfg.timebin, cfg.input, cfg.raster_seed)
        object.__setattr__(self, "_u_thresh", u)
        return u

    def quantized(self) -> "QuantizedLensModel":
        from lens_tpu.runtime.speck_sim import discretize

        return QuantizedLensModel(
            cfg=self.cfg,
            qparams=discretize(self.params, self.spike_thresholds, self.cfg.min_v_mem),
            base=self,
        )

    def with_chip_thresholds(self) -> "LensModel":
        """The on-chip threshold overrides (10 feature / 2 output,
        run_speck.py:143-144)."""
        from lens_tpu.runtime.stream import STREAM_THRESHOLDS

        return LensModel(
            cfg=self.cfg, params=self.params, spike_thresholds=STREAM_THRESHOLDS
        )

    # ---- compute ---------------------------------------------------------

    def spike_counts(
        self, intensities: np.ndarray, precision: str = "f32"
    ) -> np.ndarray:
        """(Q, n_in) intensities -> (Q, reference_places) output spike counts
        via the best available backend (Pallas on TPU).

        `precision="bf16"` routes through MXU-native bf16 operands with f32
        accumulation (the --precision bf16 CLI behavior, including its
        exactness gate and f32 fallback)."""
        if precision not in ("f32", "bf16"):  # not assert: survives python -O
            raise ValueError(
                f"precision must be 'f32' or 'bf16', got {precision!r}"
            )
        from lens_tpu.ops.fused_forward import best_forward

        return np.asarray(
            best_forward(
                self.params,
                jnp.asarray(intensities),
                jnp.asarray(self.raster_thresholds()),
                spike_thresholds=self.spike_thresholds,
                min_v_mem=self.cfg.min_v_mem,
                matmul_dtype=jnp.bfloat16 if precision == "bf16" else None,
            )
        )


@dataclass(frozen=True)
class QuantizedLensModel:
    """Chip-accurate integer variant (see runtime/speck_sim.py)."""

    cfg: LensConfig
    qparams: object
    base: LensModel

    def spike_counts(self, intensities: np.ndarray) -> np.ndarray:
        # The bucketed dispatcher, same as the CLI path: Pallas / hoisted
        # int8 routes where they apply (bit-identical, ~3x faster) and
        # query-bucket padding so dataset sizes share one executable.
        from lens_tpu.runtime.speck_sim import forward_counts_quantized_bucketed

        return np.asarray(
            forward_counts_quantized_bucketed(
                self.qparams,
                jnp.asarray(intensities, jnp.float32),
                jnp.asarray(self.base.raster_thresholds()),
            )
        )
