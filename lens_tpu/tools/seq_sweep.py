"""Sequence-window (L) characterization: LENS online/offline vs SAD at every L.

The sequence matcher's window length L is the one hyperparameter shared by
every matcher in the system — the reference fixes it at seq=4 for the online
chip run (run_speck.py's rolling matcher) and exposes it as --sequence_length
offline (run_model.py:248-252, sad.py:39-42).  Longer windows aggregate more
temporal evidence and help ANY matcher, so cross-method accuracy claims are
only meaningful at MATCHED L.  This tool maps the full L landscape on one
traverse, three ways:

  1. **online grid** (L = 1..7): the streamed per-bin counts of the chip
     winner and the pretrained baseline, scored through the OnlineMatcher at
     each L.  The forward is L-independent, so one stream replay scores the
     whole grid.  The online matcher's 4-row block ('same' conv over 4-query
     windows, run_speck.py:200-204 semantics) truncates taps beyond the
     block, so L > 7 is rank-identical to L = 7 — the grid stops there.
  2. **offline-conv grid** (L = 1..10): the SAME streamed counts scored
     through the offline full-matrix pipeline (sequence_conv 'valid' +
     cropped/dilated GT, run_model.py:216-239).  This is the appropriate
     apples-to-apples against offline SAD at large L, and isolates whether
     an online-vs-SAD gap at high L is the block protocol or the spike
     features themselves.
  3. **SAD grid** (L = 1..10): the dense-frame baseline through its standard
     offline scoring (sad.py semantics) at each L.

    python -m lens_tpu.tools.seq_sweep --traverse sunset --seeds 3,0
    python -m lens_tpu.tools.seq_sweep --traverse all --json SEQ_SWEEP.json

Streaming dynamics are integer and backend-exact (tests/test_stream_oracle),
so this runs fine on the CPU backend while the TPU is busy.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile

import jax.numpy as jnp
import numpy as np

from lens_tpu.metrics.gt import make_gt_tolerant
from lens_tpu.metrics.vpr import recall_at_k
from lens_tpu.ops.cdist import l1_cdist
from lens_tpu.ops.seqmatch import sequence_conv
from lens_tpu.run_model import RECALL_NS
from lens_tpu.sad import load_image_folder
from lens_tpu.tools.chip_sweep import (
    EVENTS_PER_BIN,
    build_stream_rasters,
    score_counts,
    stream_counts,
)
from lens_tpu.tools.online_recall import (
    find_chip_model,
    gt_path_for,
    traverse_configs,
)
from lens_tpu.utils import checkpoint
from lens_tpu.utils.compat import trapezoid

ONLINE_L_GRID = [1, 2, 3, 4, 5, 6, 7]
OFFLINE_L_GRID = [1, 2, 3, 4, 5, 6, 7, 8, 10]


def _auc(raw_recalls) -> float:
    return float(trapezoid(np.asarray(raw_recalls, float), np.asarray(RECALL_NS)))


def offline_conv_score(counts: np.ndarray, GT: np.ndarray, tolerance: int, L: int):
    """Score a (n_bins, n_places) count matrix through the OFFLINE sequence
    pipeline (run_model.py:216-239).  Stream synthesis drops partial trailing
    bins, so GT's query axis is cropped to the bin count."""
    d = np.asarray(sequence_conv(jnp.asarray(counts, jnp.float32), L))
    GTtol = make_gt_tolerant(GT[: counts.shape[0]], L, tolerance)
    raw = [recall_at_k(d, GTtol, K=n) for n in RECALL_NS]
    return [round(v, 2) for v in raw], _auc(raw)


def sweep_traverse(root: str, traverse: str, seeds, events_per_bin: int) -> dict:
    cfgs = traverse_configs(root, tempfile.gettempdir())[traverse]
    off, stream = cfgs["offline"], cfgs["stream"]
    GT = np.load(gt_path_for(off))

    models = []
    chip = find_chip_model(stream.models_dir, traverse)
    if chip is not None:
        name, params, _ = chip
        models.append(("chip", name, params, True))
    models.append(
        ("pretrained", stream.model_name(),
         checkpoint.load_model(stream.models_dir, stream.model_name()), False)
    )

    report = {
        "traverse": traverse,
        "events_per_bin": events_per_bin,
        "recall_ns": RECALL_NS,
        "models": {label: ckpt for label, ckpt, _, _ in models},
        "online_by_seed": {},
        "offline_conv_by_seed": {},
        "sad_by_L": {},
    }

    for seed in seeds:
        print(f"[{traverse}] seed {seed}: stream replay...")
        rasters = jnp.asarray(build_stream_rasters(stream, events_per_bin, seed))
        online_row, offline_row = {}, {}
        for label, _, params, compensated in models:
            counts = stream_counts(params, rasters, stream, compensated=compensated)
            online_row[label] = {}
            for L in ONLINE_L_GRID:
                recalls, auc = score_counts(counts, GT, stream, L)
                online_row[label][str(L)] = {"auc": round(auc, 3), "recall": recalls}
                print(f"  {label:10s} online  L={L}: AUC {auc:6.3f}  R@N {recalls}")
            offline_row[label] = {}
            for L in OFFLINE_L_GRID:
                recalls, auc = offline_conv_score(counts, GT, off.GT_tolerance, L)
                offline_row[label][str(L)] = {"auc": round(auc, 3), "recall": recalls}
                print(f"  {label:10s} offconv L={L}: AUC {auc:6.3f}  R@N {recalls}")
        report["online_by_seed"][str(seed)] = online_row
        report["offline_conv_by_seed"][str(seed)] = offline_row

    print(f"[{traverse}] SAD L grid (deterministic)...")
    report["sad_by_L"] = sad_L_grid(off, GT, verbose=True)
    return report


def sad_L_grid(off, GT: np.ndarray, verbose: bool = False) -> dict:
    """SAD Recall/AUC at every L in OFFLINE_L_GRID, run_sad-identical scoring.

    Only sequence_conv depends on L, so the PNG folders are loaded and the
    full L1 distance matrix computed ONCE; each L then applies the window
    conv + the same floor/reciprocal similarity transform as sad.run_sad
    (sad.py:68-83) and scores against the L-matched tolerant GT."""
    queries = load_image_folder(
        os.path.join(off.data_dir, off.dataset, off.camera, off.query),
        off.filter, off.query_places,
    )
    references = load_image_folder(
        os.path.join(off.data_dir, off.dataset, off.camera, off.reference),
        off.filter, off.reference_places,
    )
    dist = np.asarray(l1_cdist(queries, references))  # (Q, R), L-independent
    out = {}
    for L in OFFLINE_L_GRID:
        GTtol = make_gt_tolerant(GT, L, off.GT_tolerance)
        dist_seq = np.asarray(sequence_conv(dist, L))
        floor = dist_seq[dist_seq > 0].min() if (dist_seq > 0).any() else 1.0
        inv = 1.0 / np.maximum(dist_seq, floor)
        sad_recall = [round(recall_at_k(inv, GTtol, K=n), 2) for n in RECALL_NS]
        out[str(L)] = {"auc": round(_auc(sad_recall), 3), "recall": sad_recall}
        if verbose:
            print(f"  SAD L={L}: AUC {out[str(L)]['auc']:6.3f}  "
                  f"R@N {out[str(L)]['recall']}")
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Sequence-window (L) characterization")
    p.add_argument("--traverse", default="sunset", choices=["example", "sunset", "all"])
    p.add_argument("--seeds", default="3,0", help="stream synthesis seeds")
    p.add_argument("--events_per_bin", type=int, default=EVENTS_PER_BIN)
    p.add_argument("--json", default="", help="write the report JSON here")
    p.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (the grid is integer/backend-exact, so "
        "this frees the TPU; must be passed before any other jax use)",
    )
    args = p.parse_args(argv)

    if args.cpu:
        from lens_tpu.utils.jaxsetup import force_cpu

        force_cpu()

    root = os.path.join(os.path.dirname(__file__), "..", "..")
    seeds = [int(s) for s in args.seeds.split(",") if s.strip()]
    traverses = ["example", "sunset"] if args.traverse == "all" else [args.traverse]
    out = {"reports": [
        sweep_traverse(root, t, seeds, args.events_per_bin) for t in traverses
    ]}
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print("wrote", args.json)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
