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
    (the reference's DataLoader(shuffle=True), train_model.py:231-235).
    All epochs' permutations come from ONE vmapped device call — per-epoch
    dispatches are costly through a remote device link."""
    keys = jax.random.split(key, epochs)
    perms = jax.vmap(lambda k: jax.random.permutation(k, n_samples))(keys)
    return np.asarray(perms).reshape(-1)


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


def _layer_ckpt_path(models_dir: str, model_name: str, layer: str) -> str:
    stem = os.path.splitext(model_name)[0]
    return os.path.join(models_dir, f"{stem}.{layer}.trainstate.npz")


def save_layer_state(path: str, state, epoch: int) -> None:
    """Mid-training checkpoint of a LayerState (the reference can only save
    after full training — train_model.py:207-211; resume is new here)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(
        path,
        epoch=np.asarray(epoch),
        **{k: np.asarray(v) for k, v in state._asdict().items()},
    )


def load_layer_state(path: str):
    """(LayerState, next_epoch) or None if absent."""
    from lens_tpu.core.stdp import LayerState

    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        epoch = int(z["epoch"])
        state = LayerState(
            **{k: jnp.asarray(z[k]) for k in LayerState._fields}
        )
    return state, epoch


def _pad_and_shard_output_state(state: LayerState, mesh) -> LayerState:
    """Shard a layer state's OUTPUT (place) axis over the mesh's 'model'
    axis, zero-padding to a shard multiple first.

    Zero-padded columns are inert under every STDP rule: the forced index
    never points at them, their thresholds/rates/masks are zero so both
    update branches, the sign clamps, ITP, and homeostasis all leave them at
    exactly zero — trained real columns are bit-identical to the unsharded
    run (tested).  Padding happens AFTER init so the reference's
    last-output-row normalization quirk is untouched.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_model = mesh.shape["model"]
    n_out = state.w.shape[1]
    pad = (-n_out) % n_model

    def pad_mat(a):
        return jnp.pad(a, ((0, 0), (0, pad))) if pad else a

    def pad_vec(a):
        return jnp.pad(a, ((0, pad),)) if pad else a

    padded = LayerState(
        w=pad_mat(state.w),
        thr=pad_vec(state.thr),
        x=pad_vec(state.x),
        fire_rate=pad_vec(state.fire_rate),
        const_inp=pad_vec(state.const_inp),
        exc_mask=pad_mat(state.exc_mask),
        inh_mask=pad_mat(state.inh_mask),
    )
    mat = NamedSharding(mesh, P(None, "model"))
    vec = NamedSharding(mesh, P("model"))
    return LayerState(
        w=jax.device_put(padded.w, mat),
        thr=jax.device_put(padded.thr, vec),
        x=jax.device_put(padded.x, vec),
        fire_rate=jax.device_put(padded.fire_rate, vec),
        const_inp=jax.device_put(padded.const_inp, vec),
        exc_mask=jax.device_put(padded.exc_mask, mat),
        inh_mask=jax.device_put(padded.inh_mask, mat),
    )


def train(cfg: LensConfig, logger=None, checkpoint_every: int = 32,
          resume: bool = False) -> LensParams:
    """Run the full two-layer training and return inference params.

    The per-layer scan is chunked by epoch blocks of `checkpoint_every`
    epochs; after each block the layer's training state is checkpointed, and
    `resume=True` continues an interrupted run from the last block.

    On a multi-chip slice with --shard_db (or a database past
    --shard_db_auto_places), the OUTPUT layer's place axis trains sharded
    over the mesh's 'model' axis — the STDP update is column-parallel in its
    output dimension, so a database too large for one chip trains as one
    program with no intra-layer collective.
    """
    log = logger.info if logger else print

    tp_mesh = None
    if cfg.shard_db or cfg.output >= cfg.shard_db_auto_places:
        if len(jax.devices()) > 1:
            from lens_tpu.parallel.mesh import make_mesh

            tp_mesh = make_mesh(data=1)  # every chip holds a place-axis shard
            log(
                f"Output layer ({cfg.output} places) sharded over "
                f"{tp_mesh.shape['model']} devices (model axis)"
            )

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

    def train_one_layer(name, state, hyper, inputs, shuffle_key, epochs,
                        prev_fire_rate=None, prepare_state=None):
        log(f"Training layer: {name}")
        total = int(cfg.reference_places * epochs)  # train_model.py:144
        order = make_sample_stream(shuffle_key, n, epochs)
        ckpt = _layer_ckpt_path(cfg.models_dir, cfg.model_name(), name)
        start_epoch = 0
        if resume:
            loaded = load_layer_state(ckpt)
            if loaded is not None:
                state, start_epoch = loaded
                if prepare_state is not None:
                    # Re-establish sharding/padding on the loaded host arrays
                    # (checkpoints store gathered numpy; a resumed TP run
                    # would otherwise train unsharded on one device).
                    state = prepare_state(state)
                log(f"  resumed {name} at epoch {start_epoch}")
        # Cap each scan chunk at ~4096 steps: longer STDP scan modules have
        # hung the remote TPU compiler (chunking cannot change results — the
        # annealing clock uses start_step; resume-equality is tested).
        # Checkpoints stay on epoch boundaries, but within a block the scan
        # dispatches in <=4096-step sub-chunks so datasets with n > 4096
        # samples per epoch do not re-expose the long-module hang.
        block = min(max(1, checkpoint_every), max(1, 4096 // n))
        for e0 in range(start_epoch, epochs, block):
            e1 = min(e0 + block, epochs)
            for s0 in range(e0 * n, e1 * n, 4096):
                sl = slice(s0, min(s0 + 4096, e1 * n))
                state = train_layer_scan(
                    state,
                    hyper,
                    inputs[order[sl]],
                    idx_all[order[sl]],
                    total_steps=total,
                    prev_fire_rate=prev_fire_rate,
                    start_step=s0,
                )
            jax.block_until_ready(state.w)
            save_layer_state(ckpt, state, e1)
            log(f"  {name}: epoch {e1}/{epochs}")
        if os.path.exists(ckpt):
            os.remove(ckpt)  # run complete; drop the resume point
        return state

    feat_state = train_one_layer(
        "feature_layer", feat_state, feat_hyper, X, k_feat_shuf, cfg.epoch_feat
    )

    # Frozen feature responses for every sample, one batched GEMM
    # (replaces the per-step prev-layer pass of train_model.py:163-168).
    feat_spikes = clamp_spikes(X @ feat_state.w, feat_state.thr)
    if tp_mesh is not None:
        out_state = _pad_and_shard_output_state(out_state, tp_mesh)
    out_state = train_one_layer(
        "output_layer",
        out_state,
        out_hyper,
        feat_spikes,
        k_out_shuf,
        cfg.epoch_out,
        prev_fire_rate=feat_state.fire_rate,
        # A resumed checkpoint holds gathered (possibly already-padded) host
        # arrays; _pad_and_shard_output_state is idempotent (pad of 0) and
        # restores the 'model'-axis placement.
        prepare_state=(
            (lambda s: _pad_and_shard_output_state(s, tp_mesh))
            if tp_mesh is not None
            else None
        ),
    )

    return LensParams(
        w_feat=feat_state.w,
        w_out=out_state.w[:, : cfg.output],  # strip TP padding, if any
        thr_feat=feat_state.thr,
        thr_out=out_state.thr[: cfg.output],
    )


def run_training(cfg: LensConfig) -> str:
    """Full --train_model mode: checks, logging, train, save
    (reference train_model, train_model.py:213-252)."""
    checker.check_args(cfg)
    logger, _ = model_logger(cfg.output_base)
    params = train(cfg, logger, resume=cfg.resume)
    path = checkpoint.save_model(
        cfg.models_dir, cfg.model_name(), params, cfg.to_json()
    )
    logger.info(f"Saved trained model to {path}")
    return path
