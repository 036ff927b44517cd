"""Checkpointing: native .npz + JSON sidecar, plus a legacy .pth converter.

The reference persists `state_dict()` as `.pth` with the architecture encoded
in the filename `{reference}_LENS_IN{n}_FN{n}_DB{n}.pth` (reference
train_model.py:207-211, main.py:27-38).  We keep the exact filename scheme for
CLI parity, store natively as `.npz` (weights transposed to (in, out)) with a
JSON config sidecar, and read legacy `.pth` files through a tiny torch-CPU
converter — torch never enters the compute path.

Keys in the reference state dict (verified against the bundled checkpoints):
  feature_layer.w.weight (n_feat, n_in)   feature_layer.thr (1, n_feat)
  output_layer.w.weight  (n_out, n_feat)  output_layer.thr  (1, n_out)
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from lens_tpu.core.network import LensParams, params_from_numpy


def load_pth(path: str) -> LensParams:
    """Convert a legacy torch checkpoint to LensParams (weights -> (in, out))."""
    import torch  # optional compat dependency, CPU wheel

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return params_from_numpy(
        w_feat=sd["feature_layer.w.weight"].numpy().T,
        w_out=sd["output_layer.w.weight"].numpy().T,
        thr_feat=sd["feature_layer.thr"].numpy(),
        thr_out=sd["output_layer.thr"].numpy(),
    )


def save_npz(path: str, params: LensParams, config_json: Optional[str] = None) -> None:
    np.savez(
        path,
        w_feat=np.asarray(params.w_feat),
        w_out=np.asarray(params.w_out),
        thr_feat=np.asarray(params.thr_feat),
        thr_out=np.asarray(params.thr_out),
    )
    if config_json is not None:
        with open(_sidecar(path), "w") as f:
            f.write(config_json)


def load_npz(path: str) -> LensParams:
    with np.load(path) as z:
        return params_from_numpy(z["w_feat"], z["w_out"], z["thr_feat"], z["thr_out"])


def save_pth(path: str, params: LensParams) -> None:
    """Write a reference-compatible .pth so models trained here load in the
    original PyTorch implementation (state-dict layout of blitnet.py:59-64)."""
    import torch

    sd = {
        "feature_layer.w.weight": torch.from_numpy(np.asarray(params.w_feat).T.copy()),
        "feature_layer.thr": torch.from_numpy(
            np.asarray(params.thr_feat).reshape(1, -1).copy()
        ),
        "output_layer.w.weight": torch.from_numpy(np.asarray(params.w_out).T.copy()),
        "output_layer.thr": torch.from_numpy(
            np.asarray(params.thr_out).reshape(1, -1).copy()
        ),
    }
    torch.save(sd, path)


def _sidecar(path: str) -> str:
    base, _ = os.path.splitext(path)
    return base + ".config.json"


def load_model(models_dir: str, model_name: str) -> LensParams:
    """Resolve a model by its reference-scheme name, preferring the native
    format: `<name>.npz` first, then legacy `<name>` (.pth).  Mirrors
    run_model.py:353-358 load_model (map_location/strict=False become
    irrelevant in the functional design).  Loaded weights are checked
    finite — a NaN/inf checkpoint (e.g. a diverged external training run)
    would otherwise flow through every route into silently meaningless
    similarity matrices."""
    stem, _ = os.path.splitext(model_name)
    npz_path = os.path.join(models_dir, stem + ".npz")
    if os.path.exists(npz_path):
        return _check_finite(load_npz(npz_path), npz_path)
    pth_path = os.path.join(models_dir, model_name)
    if os.path.exists(pth_path):
        return _check_finite(load_pth(pth_path), pth_path)
    raise FileNotFoundError(
        f"no checkpoint named {stem}.npz or {model_name} in {models_dir}"
    )


def _check_finite(params: LensParams, path: str) -> LensParams:
    # Thresholds too: training updates them alongside weights (ITP), so a
    # diverged run can write NaN thr arrays with finite weights.
    for name, arr in (
        ("w_feat", params.w_feat),
        ("w_out", params.w_out),
        ("thr_feat", params.thr_feat),
        ("thr_out", params.thr_out),
    ):
        if not np.isfinite(np.asarray(arr)).all():
            raise ValueError(
                f"checkpoint {path}: {name} contains NaN/inf — refusing to "
                "evaluate a diverged model"
            )
    return params


def save_model(
    models_dir: str, model_name: str, params: LensParams, config_json: str
) -> str:
    """Save both native .npz (+config sidecar) and legacy-compatible .pth."""
    os.makedirs(models_dir, exist_ok=True)
    stem, _ = os.path.splitext(model_name)
    npz_path = os.path.join(models_dir, stem + ".npz")
    save_npz(npz_path, params, config_json)
    try:
        save_pth(os.path.join(models_dir, stem + ".pth"), params)
    except ImportError:
        pass
    return npz_path


def save_orbax(path: str, params: LensParams) -> bool:
    """Orbax-backed checkpoint for sharded/production deployments: preserves
    device shardings and writes atomically.  Returns False when orbax is
    unavailable (it is an optional dependency)."""
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        return False
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), dict(params._asdict()), force=True)
    return True


def load_orbax(path: str) -> Optional[LensParams]:
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        return None
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path))
    return params_from_numpy(
        restored["w_feat"], restored["w_out"], restored["thr_feat"], restored["thr_out"]
    )


def parse_model_name(model_name: str) -> dict:
    """Recover architecture metadata from the filename scheme
    (reference main.py:27-38)."""
    stem = os.path.splitext(os.path.basename(model_name))[0]
    parts = stem.split("_")
    meta = {}
    for p in parts:
        for key, tag in (("input", "IN"), ("feature", "FN"), ("places", "DB")):
            if p.startswith(tag) and p[len(tag) :].isdigit():
                meta[key] = int(p[len(tag) :])
    return meta
