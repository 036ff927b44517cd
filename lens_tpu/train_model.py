"""Training orchestrator: greedy layer-by-layer STDP
(reference lens/train_model.py:41-252).

The reference trains feature then output layer, each for `epoch_*` epochs over
the reference traverse through a shuffled batch-1 DataLoader.  Here each
layer's whole training run is ONE jitted `lax.scan` over the flattened
(epochs x places) sample stream (core/stdp.py), with the per-epoch shuffles
precomputed from a seeded PRNG.  The output layer's inputs — the frozen
feature layer's clamped responses (train_model.py:163-168) — are precomputed
for all samples in a single batched GEMM instead of per step.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lens_tpu import checker
from lens_tpu.config import LensConfig
from lens_tpu.core.network import LensParams
from lens_tpu.core.stdp import (
    LayerHyper,
    LayerState,
    clamp_spikes,
    init_layer,
    train_layer_scan,
)
from lens_tpu.data.dataset import FrameDataset
from lens_tpu.utils import checkpoint
from lens_tpu.utils.loggers import model_logger


def make_sample_stream(
    key: jax.Array, n_samples: int, epochs: int
) -> np.ndarray:
    """(epochs * n_samples,) indices: an independent shuffle per epoch
    (the reference's DataLoader(shuffle=True), train_model.py:231-235)."""
    keys = jax.random.split(key, epochs)
    perms = [np.asarray(jax.random.permutation(k, n_samples)) for k in keys]
    return np.concatenate(perms)


def init_training_layers(
    cfg: LensConfig, key: jax.Array
) -> Tuple[Tuple[LayerState, LayerHyper], Tuple[LayerState, LayerHyper]]:
    """Both layers with the reference hyperparameter wiring
    (train_model.py:73-93)."""
    k_feat, k_out = jax.random.split(key)
    feat = init_layer(
        k_feat,
        cfg.input,
        cfg.feature,
        thr_range=(cfg.thr_l_feat, cfg.thr_h_feat),
        fire_rate=(cfg.fire_l_feat, cfg.fire_h_feat),
        ip_rate=cfg.ip_rate_feat,
        stdp_rate=cfg.stdp_rate_feat,
        p=(cfg.f_exc, cfg.f_inh),
        spk_force=False,
    )
    out = init_layer(
        k_out,
        cfg.feature,
        cfg.output,
        thr_range=(cfg.thr_l_out, cfg.thr_h_out),
        fire_rate=(cfg.fire_l_out, cfg.fire_h_out),
        ip_rate=cfg.ip_rate_out,
        stdp_rate=cfg.stdp_rate_out,
        p=(cfg.o_exc, cfg.o_inh),
        spk_force=True,
    )
    return feat, out


def train(cfg: LensConfig, logger=None) -> LensParams:
    """Run the full two-layer training and return inference params."""
    log = logger.info if logger else print

    reference_dir = os.path.join(cfg.data_dir, cfg.dataset, cfg.camera, cfg.reference)
    dataset_file = os.path.join(cfg.data_dir, cfg.reference + ".csv")
    ds = FrameDataset.load(
        dataset_file, reference_dir, skip=cfg.filter, max_samples=cfg.reference_places
    )
    X = jnp.asarray(ds.train_intensities(cfg.dims))  # (N, n_in) analog
    # Forced output index = label / filter (train_model.py:161).
    idx_all = jnp.asarray(ds.labels // cfg.filter, jnp.int32)
    n = X.shape[0]

    key = jax.random.PRNGKey(cfg.train_seed)
    k_init, k_feat_shuf, k_out_shuf = jax.random.split(key, 3)
    (feat_state, feat_hyper), (out_state, out_hyper) = init_training_layers(
        cfg, k_init
    )

    # --- feature layer ---------------------------------------------------
    log("Training layer: feature_layer")
    order = make_sample_stream(k_feat_shuf, n, cfg.epoch_feat)
    total = int(cfg.reference_places * cfg.epoch_feat)  # train_model.py:144
    feat_state = train_layer_scan(
        feat_state,
        feat_hyper,
        X[order],
        idx_all[order],
        total_steps=total,
    )
    jax.block_until_ready(feat_state.w)

    # --- output layer ----------------------------------------------------
    log("Training layer: output_layer")
    # Frozen feature responses for every sample, one batched GEMM
    # (replaces the per-step prev-layer pass of train_model.py:163-168).
    feat_spikes = clamp_spikes(X @ feat_state.w, feat_state.thr)
    order = make_sample_stream(k_out_shuf, n, cfg.epoch_out)
    total = int(cfg.reference_places * cfg.epoch_out)
    out_state = train_layer_scan(
        out_state,
        out_hyper,
        feat_spikes[order],
        idx_all[order],
        total_steps=total,
        prev_fire_rate=feat_state.fire_rate,
    )
    jax.block_until_ready(out_state.w)

    return LensParams(
        w_feat=feat_state.w,
        w_out=out_state.w,
        thr_feat=feat_state.thr,
        thr_out=out_state.thr,
    )


def run_training(cfg: LensConfig) -> str:
    """Full --train_model mode: checks, logging, train, save
    (reference train_model, train_model.py:213-252)."""
    checker.check_args(cfg)
    logger, _ = model_logger(cfg.output_base)
    params = train(cfg, logger)
    path = checkpoint.save_model(
        cfg.models_dir, cfg.model_name(), params, cfg.to_json()
    )
    logger.info(f"Saved trained model to {path}")
    return path
