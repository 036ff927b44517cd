"""Hyperparameter sweep as one vmapped device program.

The reference's optimizer.py runs a serial W&B random search — each trial
retrains and re-evaluates from scratch in its own process (reference
optimizer.py:76-104).  On TPU the entire trial batch becomes a single
program: trial states are stacked into a leading axis and `jax.vmap` runs
every trial's full STDP scan and inference forward simultaneously — the MXU
sees one big batched GEMM instead of N tiny serial ones.

On a multi-chip slice the TRIAL axis is additionally sharded across the
mesh's 'data' axis (trial states device_put with P('data'), shared data
replicated): N trials spread over all chips in the same single program, so
sweep wall-clock scales with device count.  Trials are padded to a device
multiple by repeating the last config (padding discarded from results).

Search space matches optimizer.py:63-67: fire_l_feat in linspace(0.1, 0.49,
16), fire_h_feat in linspace(0.5, 1.0, 16), thr_h_feat in linspace(0.1, 0.5,
8), objective AUC = trapezoid(Recall@N over N=[1,5,10,15,20,25])
(optimizer.py:100-102).  W&B logging is optional; results always land in
sweep_results.json.

`wide=True` (round-5 chip-regime sweep) extends the space beyond the
reference triple: output-layer threshold/fire ranges, per-layer stdp
learning rates (routed through train_layer_scan's traced overrides so
trials stay in one vmapped program; ip rates are a dead knob past step 0 —
see sample_search_space), and exc/inh connection probabilities;
per-trial `sequence_length` is honored at scoring time.  `trials=[...]`
injects an explicit list (grid refinement, reproducibility).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, replace
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lens_tpu.config import LensConfig
from lens_tpu.core.network import LensParams, forward_counts_stepwise
from lens_tpu.core.stdp import clamp_spikes, train_layer_scan
from lens_tpu.data.dataset import FrameDataset
from lens_tpu.metrics.gt import make_gt_tolerant
from lens_tpu.metrics.vpr import recall_at_k
from lens_tpu.ops.seqmatch import sequence_conv
from lens_tpu.run_model import RECALL_NS, make_query_thresholds
from lens_tpu.train_model import init_training_layers, make_sample_stream


@dataclass
class SweepResult:
    trials: List[dict]  # sampled hyperparameters per trial
    recalls: np.ndarray  # (n_trials, 6)
    auc: np.ndarray  # (n_trials,)
    best: int  # index of the best trial
    params: Optional[List[LensParams]] = None  # per-trial trained params
    # (populated when run_sweep(return_params=True); consumers like the
    # chip-regime sweep re-evaluate trials through the STREAMING path)


def sample_search_space(
    rng: np.random.Generator, n_trials: int, wide: bool = False
) -> List[dict]:
    """Random draws from the reference's grid (optimizer.py:63-67).

    `wide` (round-5 chip-regime sweep): extends the space beyond the
    reference's feature triple with every trainable-regime knob that keeps
    trials in ONE vmapped program — output-layer threshold/fire ranges,
    per-layer stdp learning rates (log-uniform around the defaults; these
    drive BOTH rates after the reference's first anneal — see the ip_rate
    note below), and the exc/inh connection probabilities.  All keys are
    LensConfig fields, so a trial dict applies with dataclasses.replace."""
    fl = np.linspace(0.1, 0.49, 16)
    fh = np.linspace(0.5, 1.0, 16)
    th = np.linspace(0.1, 0.5, 8)
    trials = [
        {
            "fire_l_feat": float(rng.choice(fl)),
            "fire_h_feat": float(rng.choice(fh)),
            "thr_h_feat": float(rng.choice(th)),
        }
        for _ in range(n_trials)
    ]
    if wide:
        th_out = np.linspace(0.1, 0.75, 8)  # default 0.5
        fo = np.linspace(0.2, 0.8, 13)  # default 0.5/0.5
        p_exc = np.linspace(0.1, 0.6, 11)  # default 0.35
        p_inh = np.linspace(0.25, 0.95, 15)  # default 0.75

        def log_u(lo: float, hi: float) -> float:
            return float(np.exp(rng.uniform(np.log(lo), np.log(hi))))

        for t in trials:
            f1, f2 = sorted(rng.choice(fo, 2))
            # ip_rate_* are NOT search dimensions: the reference rebases
            # eta_ip to 2*eta_stdp*pt at the first anneal (train_model.py:
            # 151-152, 179 — init_itp = eta_stdp*2), so the configured
            # ip_rate affects exactly one training step out of thousands.
            # Sweeping it would dilute trial budget over a dead knob (and
            # record misleading "winning" values).  stdp_rate_* drives BOTH
            # rates and stays a real dimension.  Explicit trial lists
            # (--trials_json) may still carry ip_rate_* keys — the vmapped
            # overrides honor them for replay fidelity.
            t.update(
                thr_h_out=float(rng.choice(th_out)),
                fire_l_out=float(f1),
                fire_h_out=float(f2),
                stdp_rate_feat=log_u(0.0025, 0.04),  # default 0.01
                stdp_rate_out=log_u(0.0025, 0.04),
                f_exc=float(rng.choice(p_exc)),
                f_inh=float(rng.choice(p_inh)),
            )
    return trials


def _stack_states(states):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def run_sweep(
    cfg: LensConfig,
    n_trials: int = 8,
    seed: int = 0,
    logger=None,
    output_folder: Optional[str] = None,
    use_wandb: bool = False,
    shard_trials: Optional[bool] = None,
    return_params: bool = False,
    wide: bool = False,
    trials: Optional[List[dict]] = None,
) -> SweepResult:
    """`wide` samples the extended chip-regime space (see
    sample_search_space) and routes per-trial learning rates through the
    traced train_layer_scan overrides.  `trials` injects an explicit trial
    list (grid refinement around a winner, reproducibility) instead of
    sampling; every key must be a LensConfig field name."""
    log = logger.info if logger else print
    rng = np.random.default_rng(seed)
    if trials is None:
        trials = sample_search_space(rng, n_trials, wide=wide)
    else:
        trials = [dict(t) for t in trials]
        n_trials = len(trials)
    # Per-trial learning rates need the traced-override path (a static
    # hyper cannot vary under vmap); engaged exactly when any trial
    # carries a rate key, so the classic 3-dim sweep keeps its original
    # (bit-tested) static-rate program.
    rate_keys = ("ip_rate_feat", "stdp_rate_feat", "ip_rate_out", "stdp_rate_out")
    dynamic_rates = any(k in t for t in trials for k in rate_keys)

    # Mesh-shard the trial axis when a multi-chip slice is present (default).
    mesh = None
    if shard_trials is None:
        shard_trials = len(jax.devices()) > 1
    n_padded = n_trials
    if shard_trials and len(jax.devices()) > 1:
        from lens_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        n_dev = mesh.shape["data"]
        n_padded = ((n_trials + n_dev - 1) // n_dev) * n_dev
        trials = trials + [trials[-1]] * (n_padded - n_trials)

    # --- data (shared across trials) -------------------------------------
    ref_dir = os.path.join(cfg.data_dir, cfg.dataset, cfg.camera, cfg.reference)
    ds = FrameDataset.load(
        os.path.join(cfg.data_dir, cfg.reference + ".csv"),
        ref_dir,
        skip=cfg.filter,
        max_samples=cfg.reference_places,
    )
    X = jnp.asarray(ds.train_intensities(cfg.dims))
    idx_all = jnp.asarray(ds.labels // cfg.filter, jnp.int32)
    n = X.shape[0]

    qry_dir = os.path.join(cfg.data_dir, cfg.dataset, cfg.camera, cfg.query)
    qds = FrameDataset.load(
        os.path.join(cfg.data_dir, cfg.query + ".csv"),
        qry_dir,
        skip=cfg.filter,
        max_samples=cfg.query_places,
    )
    q_intens = jnp.asarray(qds.query_intensities_downsampled(cfg.dims))
    u_thresh = jnp.asarray(make_query_thresholds(cfg))

    # --- per-trial init (host loop; tiny), stacked into a trial axis ------
    key = jax.random.PRNGKey(cfg.train_seed)
    k_init, k_feat_shuf, k_out_shuf = jax.random.split(key, 3)
    feat_states, out_states = [], []
    feat_hyper = out_hyper = None
    for t in trials:
        tcfg = replace(cfg, **t)  # every trial key is a LensConfig field
        (fs, feat_hyper), (os_, out_hyper) = init_training_layers(tcfg, k_init)
        feat_states.append(fs)
        out_states.append(os_)
    feat_b = _stack_states(feat_states)
    out_b = _stack_states(out_states)
    if dynamic_rates:
        # Shared static hypers carry the LAST trial's rates; neutralize any
        # accidental use by pinning them to the config defaults — the real
        # per-trial rates flow through the traced overrides below.
        feat_hyper = feat_hyper._replace(
            ip_rate=cfg.ip_rate_feat, stdp_rate=cfg.stdp_rate_feat
        )
        out_hyper = out_hyper._replace(
            ip_rate=cfg.ip_rate_out, stdp_rate=cfg.stdp_rate_out
        )
        feat_ip = jnp.asarray(
            [t.get("ip_rate_feat", cfg.ip_rate_feat) for t in trials], jnp.float32
        )
        feat_sr = jnp.asarray(
            [t.get("stdp_rate_feat", cfg.stdp_rate_feat) for t in trials],
            jnp.float32,
        )
        out_ip = jnp.asarray(
            [t.get("ip_rate_out", cfg.ip_rate_out) for t in trials], jnp.float32
        )
        out_sr = jnp.asarray(
            [t.get("stdp_rate_out", cfg.stdp_rate_out) for t in trials],
            jnp.float32,
        )

    if mesh is not None:
        # Trial axis -> 'data' mesh axis; shared tensors replicated.  XLA
        # partitions every vmapped program below across the slice.
        from jax.sharding import NamedSharding, PartitionSpec as P

        trial_sharding = NamedSharding(mesh, P("data"))
        feat_b = jax.device_put(feat_b, trial_sharding)
        out_b = jax.device_put(out_b, trial_sharding)
        if dynamic_rates:
            feat_ip, feat_sr, out_ip, out_sr = (
                jax.device_put(a, trial_sharding)
                for a in (feat_ip, feat_sr, out_ip, out_sr)
            )
        repl = NamedSharding(mesh, P())
        X = jax.device_put(X, repl)
        idx_all = jax.device_put(idx_all, repl)
        q_intens = jax.device_put(q_intens, repl)
        u_thresh = jax.device_put(u_thresh, repl)

    # --- batched training: vmap over the trial axis -----------------------
    order_f = make_sample_stream(k_feat_shuf, n, cfg.epoch_feat)
    order_o = make_sample_stream(k_out_shuf, n, cfg.epoch_out)
    total_f = int(cfg.reference_places * cfg.epoch_feat)
    total_o = int(cfg.reference_places * cfg.epoch_out)

    log(
        f"Sweep: training {n_trials} trials in one vmapped program"
        + (
            f" (trial axis sharded over {mesh.shape['data']} devices)"
            if mesh is not None
            else ""
        )
    )
    # Chunking (as in train_model.train): shorter scans compile reliably on
    # the remote TPU toolchain and bound per-dispatch latency.  HARD-cap the
    # chunk at ~4096 scan steps regardless of dataset size — longer STDP
    # scan modules have hung the remote compiler (BENCHMARKS.md notes), and
    # the sweep has no checkpoint alignment to respect, so sub-epoch chunks
    # are fine; chunk boundaries cannot change results (the annealing clock
    # uses start_step; resume-equality is tested).
    block = max(1, min(32 * n, 4096))

    if dynamic_rates:

        def feat_chunk(st_b, sl, start):
            return jax.vmap(
                lambda st, ip, sr: train_layer_scan(
                    st, feat_hyper, X[order_f[sl]], idx_all[order_f[sl]],
                    total_steps=total_f, start_step=start,
                    ip_rate=ip, stdp_rate=sr,
                )
            )(st_b, feat_ip, feat_sr)

    else:

        def feat_chunk(st_b, sl, start):
            return jax.vmap(
                lambda st: train_layer_scan(
                    st, feat_hyper, X[order_f[sl]], idx_all[order_f[sl]],
                    total_steps=total_f, start_step=start,
                )
            )(st_b)

    for s0 in range(0, total_f, block):
        feat_b = feat_chunk(feat_b, slice(s0, min(s0 + block, total_f)), s0)

    # Frozen feature responses: one batched GEMM per trial, computed ONCE —
    # they depend only on the final feat_b, not on the output-chunk loop.
    spikes_b = jax.vmap(lambda f: clamp_spikes(X @ f.w, f.thr))(feat_b)

    for s0 in range(0, total_o, block):
        sl = slice(s0, min(s0 + block, total_o))
        if dynamic_rates:
            out_b = jax.vmap(
                lambda spikes, fire, ost, ip, sr: train_layer_scan(
                    ost, out_hyper, spikes[order_o[sl]], idx_all[order_o[sl]],
                    total_steps=total_o, start_step=s0,
                    prev_fire_rate=fire, ip_rate=ip, stdp_rate=sr,
                )
            )(spikes_b, feat_b.fire_rate, out_b, out_ip, out_sr)
        else:
            out_b = jax.vmap(
                lambda spikes, fire, ost: train_layer_scan(
                    ost, out_hyper, spikes[order_o[sl]], idx_all[order_o[sl]],
                    total_steps=total_o, start_step=s0,
                    prev_fire_rate=fire,
                )
            )(spikes_b, feat_b.fire_rate, out_b)

    # --- batched inference -------------------------------------------------
    params_b = LensParams(
        w_feat=feat_b.w, w_out=out_b.w, thr_feat=feat_b.thr, thr_out=out_b.thr
    )
    counts_b = jax.vmap(
        # Stepwise scan, not the hoisted forward: the hoist materializes
        # (T, Q, n) tensors which, vmapped over trials, exceed HBM on large
        # datasets (e.g. 8 trials x T=1000 x 724 x 641 f32 = 17.9 GB).  The
        # scan's footprint is the (trials, Q, n) carries only.
        lambda p: forward_counts_stepwise(p, q_intens, u_thresh, min_v_mem=cfg.min_v_mem)
    )(params_b)
    counts_b = np.asarray(counts_b)[:n_trials]  # drop mesh padding
    trials = trials[:n_trials]

    # --- metrics + objective (host; tiny) ---------------------------------
    gt_path = os.path.join(
        cfg.data_dir, cfg.dataset, cfg.camera, f"{cfg.reference}_{cfg.query}_GT.npy"
    )
    GT = np.load(gt_path)
    gttol_cache: dict = {}  # per-trial sequence_length -> cropped+dilated GT
    recalls = np.zeros((n_trials, len(RECALL_NS)))
    for i in range(n_trials):
        seq_i = int(trials[i].get("sequence_length", cfg.sequence_length))
        if seq_i not in gttol_cache:
            gttol_cache[seq_i] = make_gt_tolerant(GT, seq_i, cfg.GT_tolerance)
        dist = np.asarray(sequence_conv(counts_b[i], seq_i))
        recalls[i] = [
            recall_at_k(dist, gttol_cache[seq_i], K=k) for k in RECALL_NS
        ]
    # numpy 2 renamed trapz; support both (pyproject pins only "numpy").
    from lens_tpu.utils.compat import trapezoid as _trapezoid
    auc = _trapezoid(recalls, np.array(RECALL_NS), axis=1)
    best = int(np.argmax(auc))

    for i, t in enumerate(trials):
        log(f"trial {i}: {t} AUC={auc[i]:.3f} R@1={recalls[i,0]:.2f}")
    log(f"best trial: {best} AUC={auc[best]:.3f}")

    if use_wandb:
        try:  # optional, absent in this image
            import wandb

            for i, t in enumerate(trials):
                run = wandb.init(project="lens-tpu-sweep", config=t, reinit=True)
                run.log({"AUC": float(auc[i])})
                run.finish()
        except ImportError:
            log("wandb not installed; results saved locally only")

    if output_folder:
        os.makedirs(output_folder, exist_ok=True)
        with open(os.path.join(output_folder, "sweep_results.json"), "w") as f:
            json.dump(
                {
                    "trials": trials,
                    "recalls": recalls.tolist(),
                    "auc": auc.tolist(),
                    "best": best,
                },
                f,
                indent=2,
            )
    params_out = None
    if return_params:
        params_np = jax.tree.map(np.asarray, params_b)
        params_out = [
            LensParams(
                w_feat=params_np.w_feat[i],
                w_out=params_np.w_out[i],
                thr_feat=params_np.thr_feat[i],
                thr_out=params_np.thr_out[i],
            )
            for i in range(n_trials)
        ]
    return SweepResult(
        trials=trials, recalls=recalls, auc=auc, best=best, params=params_out
    )
