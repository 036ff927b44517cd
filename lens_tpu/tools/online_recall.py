"""Online-mode Recall@N benchmark — the reference's headline result type.

The reference's published accuracy (QCR indoor 0.36/0.55/0.68/0.80/0.84/0.88,
BASELINE.md) comes from an *online event-driven run* on the Speck2f chip:
run_speck.py:177-226 feeds per-bin spike counts through the rolling sequence
matcher and ships the resulting similarity matrix + the SAD-vs-LENS overlay
CSV (reference lens/data/Figure3/220724-16-14-33/SADvLENS_indoor.csv).  This
tool reproduces that result type with no hardware:

  1. synthesize a DVS stream from a query traverse at on-chip density
     (tools/make_event_stream.py — ~8e4 events/s, the density the reference
     hardware logs show),
  2. replay it through the FULL --event_driven pipeline (event-time AER
     integration -> quantized network at the on-chip 10/2 thresholds ->
     OnlineMatcher with the cumulative-accumulator quirk), persisting
     similarity_matrix.npy exactly as run_speck.py does,
  3. score the saved online matrix against ground truth at sequence-column
     granularity (each matcher column covers QUERIES_PER_SEQUENCE query bins),
  4. run the offline pipeline and the SAD baseline on the same traverse, and
  5. emit the reference's artifact: an N,SAD,LENS_offline,LENS_online CSV
     plus a machine-readable JSON report.

Where a bundled chip-sweep winner exists, two more rows are produced: the
winner through the same block-matcher replay (`chip_online`), and the winner
through the FULL-matrix online matcher at the matched-L peak
(`chip_full_online`, --online_matcher full at L=FULL_MATCHER_L) with SAD
re-scored at the SAME L (`sad_at_full_L`) — cross-method accuracy is only
meaningful at matched L (BENCHMARKS.md matched-L section).  The full-matcher
replay goes through the identical --event_driven CLI path and is scored via
analyze_full_online, so it cross-checks SEQ_SWEEP.json's offline-conv column
through an independent pipeline (they must agree exactly: the matcher is
bit-equal to sequence_conv, tests/test_stream_full_matcher.py).

Model preparation mirrors tests/test_stream_recall_e2e.py: the float
checkpoint's weights are scaled by the streaming threshold overrides
(w_feat x10, w_out x2) — a threshold change is exactly compensated by a
weight scale on a linear IAF layer — standing in for the sweep-tuned chip
models the paper deploys (reference run_speck.py:143-144).

GT mapping for the online matrix: the offline pipeline crops GT for the
sequence conv's 'valid' shape change (run_model.py:269-270); the online
matcher uses a 'same' conv over rolling windows and never changes shape, so
the online score uses the UNCROPPED dilated GT, with matcher column m
covering query bins [W*m, W*(m+1)) (W = QUERIES_PER_SEQUENCE) — a column is
correct if its matched place is GT-tolerant for any bin in its window (the
convention of tests/test_stream_recall_e2e.py).

    python -m lens_tpu.tools.online_recall --traverse example
    python -m lens_tpu.tools.online_recall --traverse sunset
    python -m lens_tpu.tools.online_recall --traverse all \
        --json STREAM_RECALL.json --csv_dir lens/data/online
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import tempfile
import time

import numpy as np

from lens_tpu.config import LensConfig
from lens_tpu.core.network import LensParams
from lens_tpu.metrics.gt import dilate_gt
from lens_tpu.metrics.vpr import recall_at_k
from lens_tpu.run_model import RECALL_NS, run_inference
from lens_tpu.runtime.stream import QUERIES_PER_SEQUENCE, run_event_driven
from lens_tpu.sad import run_sad
from lens_tpu.tools.make_event_stream import synthesize_events
from lens_tpu.utils import checkpoint
from lens_tpu.utils.table import ascii_table

EVENTS_PER_BIN = 20_000  # on-chip density: ~8e4 ev/s at 250 ms bins
# Streaming threshold compensation (run_speck.py:143-144 overrides 10/2;
# a linear IAF layer's spikes are invariant under (w, thr) -> (c*w, c*thr)).
FEAT_SCALE, OUT_SCALE = 10.0, 2.0
# Matched-L operating point for the full-matrix online matcher row: the
# largest L of the matched-L characterization grid (SEQ_SWEEP.json /
# BENCHMARKS.md), where longer temporal evidence helps every matcher and the
# chip winners' margin over SAD is widest.
FULL_MATCHER_L = 10


def traverse_configs(root: str, out_base: str) -> dict:
    """Offline + streaming config pairs for the two bundled traverses."""
    data_dir = os.path.join(root, "lens", "dataset") + os.sep
    models_dir = os.path.join(root, "lens", "models")
    example = dict(
        data_dir=data_dir, models_dir=models_dir, output_base=out_base,
        matching=True, headless=True,
    )
    sunset = dict(
        example,
        dataset="brisevent", camera="davis346",
        reference="sunset2", query="sunset1",
        reference_places=641, query_places=724,
        sequence_length=4, GT_tolerance=2, timebin=1000,
        dims=7, feature_multiplier=63 / 49,
    )
    return {
        "example": {
            "offline": LensConfig(**example),
            # Streaming geometry = offline geometry for the 80x80 frames.
            "stream": LensConfig(**example, event_driven=True),
        },
        "sunset": {
            "offline": LensConfig(**sunset, roi_dim=49),
            # The 7x7 brisevent frames ARE the network input (k=1 identity
            # downsample); stream them as a 7x7 sensor at origin (0,0).
            "stream": LensConfig(
                **sunset, roi_dim=7, roi_x=0, roi_y=0, event_driven=True
            ),
        },
    }


def prepare_stream_model(cfg: LensConfig, models_dir: str, tmp_dir: str) -> None:
    """Save the threshold-compensated checkpoint under cfg.models_dir."""
    params = checkpoint.load_model(models_dir, cfg.model_name())
    rescaled = LensParams(
        w_feat=params.w_feat * FEAT_SCALE,
        w_out=params.w_out * OUT_SCALE,
        thr_feat=params.thr_feat,
        thr_out=params.thr_out,
    )
    checkpoint.save_model(tmp_dir, cfg.model_name(), rescaled, cfg.to_json())


def _newest_run_dir(output_base: str) -> str:
    """Newest run dir by MTIME, not by name: run dirs are %d%m%y-%H-%M-%S
    (day-first), which misorders lexicographically across day/month
    boundaries — a sweep crossing midnight into a new month would silently
    re-score the previous run's matrix (same fix as bench.py's live-stream
    section)."""
    return max(
        (os.path.join(output_base, d) for d in os.listdir(output_base)),
        key=os.path.getmtime,
    )


def load_online_matrix(output_base: str) -> np.ndarray:
    """(n_places, n_cols) similarity matrix from the newest run's artifact
    (the appender stores one (n_places,) row per sequence column)."""
    return np.load(
        os.path.join(_newest_run_dir(output_base), "similarity_matrix.npy")
    ).T


def streaming_column_gt(GT: np.ndarray, tolerance: int, n_cols: int) -> np.ndarray:
    """(n_places, n_cols) GT at matcher-column granularity: column m is
    GT-positive for place p if p is tolerant-correct for ANY query bin in
    [W*m, W*(m+1)) — see module docstring for why the offline sequence crop
    does not apply online."""
    GTd = dilate_gt(GT, tolerance).T.astype(bool)  # (n_places, n_query)
    n_places, n_q = GTd.shape
    W = QUERIES_PER_SEQUENCE
    cols = np.zeros((n_places, n_cols), dtype=bool)
    for m in range(n_cols):
        lo, hi = W * m, min(W * (m + 1), n_q)
        if lo < n_q:
            cols[:, m] = GTd[:, lo:hi].any(axis=1)
    return cols


def online_recall_values(
    S_stream: np.ndarray, GT: np.ndarray, tolerance: int
) -> list:
    """UNROUNDED online Recall@N — for AUC/ranking (chip_sweep trial
    selection), where display rounding would add ~0.1 AUC of noise."""
    GTcols = streaming_column_gt(GT, tolerance, S_stream.shape[1])
    return [recall_at_k(S_stream, GTcols, K=n) for n in RECALL_NS]


def online_recall(S_stream: np.ndarray, GT: np.ndarray, tolerance: int) -> list:
    return [
        round(v, 2) for v in online_recall_values(S_stream, GT, tolerance)
    ]


def gt_path_for(cfg: LensConfig) -> str:
    """The traverse's ground-truth file under the standard dataset layout."""
    return os.path.join(
        cfg.data_dir, cfg.dataset, cfg.camera,
        f"{cfg.reference}_{cfg.query}_GT.npy",
    )


def run_stream_once(
    stream: LensConfig, GT: np.ndarray, events_per_bin: int, seed: int,
    params: LensParams | None = None,
) -> dict:
    """One full --event_driven replay at the given density; returns the
    scored online Recall@N row.  `params` substitutes an already
    chip-regime-compensated model (e.g. the bundled chip-sweep winners,
    saved pre-scaled x10/x2) — it is staged under the STOCK model name
    with NO rescale, so the replay exercises the identical CLI path."""
    from dataclasses import replace

    from lens_tpu.runtime.stream import frame_source

    stream = replace(stream)
    frames, _ = frame_source(stream)
    with tempfile.TemporaryDirectory() as tmp:
        events = synthesize_events(
            frames.astype(np.float64),
            stream.timebin / 1000.0,
            events_per_bin,
            roi_origin=(stream.roi_x, stream.roi_y),
            seed=seed,
        )
        stream_path = os.path.join(tmp, "stream.npy")
        np.save(stream_path, events)
        stream.event_file = stream_path
        models_src = stream.models_dir
        stream.models_dir = os.path.join(tmp, "models")
        if params is not None:
            checkpoint.save_model(
                stream.models_dir, stream.model_name(), params, stream.to_json()
            )
        else:
            prepare_stream_model(stream, models_src, stream.models_dir)
        t0 = time.perf_counter()
        run_event_driven(stream)
        stream_wall = time.perf_counter() - t0
    if stream.online_matcher == "full":
        # Full-matrix matcher runs emit distance_matrix_online.npy (one
        # (R-L+1,) row per query window, already sequence-matched) and are
        # scored through the OFFLINE pipeline's GT treatment — the matcher
        # is bit-equal to sequence_conv (tests/test_stream_full_matcher.py).
        from lens_tpu.tools.analyze import analyze_full_online

        M = np.load(
            os.path.join(
                _newest_run_dir(stream.output_base),
                "distance_matrix_online.npy",
            )
        )
        scored = analyze_full_online(
            M, GT, stream.sequence_length, stream.GT_tolerance
        )
        return {
            "events_per_bin": events_per_bin,
            "online": [round(v, 2) for v in scored["recall_at_n"].values()],
            "auc": round(scored["auc"], 3),
            "n_match_columns": int(M.shape[0]),
            "stream_wall_s": round(stream_wall, 1),
            "_matrix": M.T,
        }
    S_stream = load_online_matrix(stream.output_base)
    return {
        "events_per_bin": events_per_bin,
        "online": online_recall(S_stream, GT, stream.GT_tolerance),
        "n_match_columns": int(S_stream.shape[1]),
        "stream_wall_s": round(stream_wall, 1),
        "_matrix": S_stream,
    }


def run_traverse(name: str, cfgs: dict, events_per_bin: int, seed: int) -> dict:
    off: LensConfig = cfgs["offline"]
    stream: LensConfig = cfgs["stream"]

    GT = np.load(gt_path_for(off))

    # --- online: synthesize the stream and run the full event-driven mode
    srun = run_stream_once(stream, GT, events_per_bin, seed)
    S_stream = srun["_matrix"]
    online = srun["online"]
    stream_wall = srun["stream_wall_s"]

    # --- offline: the standard inference pipeline on the same traverse
    res = run_inference(off)
    offline = res.recall_at_n

    # --- SAD baseline (offline; the reference's comparison row)
    from lens_tpu.metrics.gt import make_gt_tolerant

    GTtol = make_gt_tolerant(GT, off.sequence_length, off.GT_tolerance)
    _, sad_recall = run_sad(
        os.path.join(off.data_dir, off.dataset, off.camera, off.reference),
        os.path.join(off.data_dir, off.dataset, off.camera, off.query),
        GTtol,
        res.output_folder,
        off.sequence_length,
        skip=off.filter,
        n_ref=off.reference_places,
        n_query=off.query_places,
    )

    n_bins = int(S_stream.shape[1]) * QUERIES_PER_SEQUENCE
    report = {
        "traverse": name,
        "model": off.model_name(""),
        "events_per_bin": events_per_bin,
        "timebin_ms": off.timebin,
        "n_query_bins": n_bins,
        "n_match_columns": int(S_stream.shape[1]),
        "recall_ns": RECALL_NS,
        "online": online,
        "offline": offline,
        "sad": sad_recall,
        "online_minus_offline_at_1": round(online[0] - offline[0], 4),
        "stream_wall_s": stream_wall,
    }

    # --- chip-regime sweep winner (if bundled): same replay, pre-scaled
    # checkpoint loaded as-is (chip_sweep.py --save_best ships x10/x2
    # compensated weights — see BENCHMARKS.md chip-regime sections).
    chip = find_chip_model(stream.models_dir, name)
    if chip is not None:
        chip_name, chip_params, chip_meta = chip
        # Replay at the winner's RECORDED operating point: chip_sweep
        # --save_best writes sequence_length/timebin into the sidecar, and
        # a winner tuned at e.g. 500 ms bins scored at the stock cadence
        # would silently non-reproduce its advertised recall.  (The bundled
        # winners match the stock settings, so this is drift-proofing.)
        from dataclasses import replace as _replace

        chip_stream = _replace(
            stream,
            sequence_length=int(
                chip_meta.get("sequence_length", stream.sequence_length)
            ),
            timebin=int(chip_meta.get("timebin", stream.timebin)),
        )
        crun = run_stream_once(
            chip_stream, GT, events_per_bin, seed, params=chip_params
        )
        report["chip_model"] = chip_name
        report["chip_online"] = crun["online"]
        report["chip_stream_wall_s"] = crun["stream_wall_s"]

        # --- full-matrix online matcher at the matched-L peak: the live
        # streaming path that carries the offline pipeline's accuracy
        # (--online_matcher full; bit-equal to sequence_conv by
        # tests/test_stream_full_matcher.py).  SAD is re-scored at the SAME
        # L — cross-method accuracy is only meaningful at matched L
        # (BENCHMARKS.md matched-L section, SEQ_SWEEP.json).
        full_stream = _replace(
            chip_stream,
            online_matcher="full",
            sequence_length=FULL_MATCHER_L,
        )
        frun = run_stream_once(
            full_stream, GT, events_per_bin, seed, params=chip_params
        )
        report["chip_full_L"] = FULL_MATCHER_L
        report["chip_full_online"] = frun["online"]
        report["chip_full_auc"] = frun["auc"]
        report["chip_full_stream_wall_s"] = frun["stream_wall_s"]

        GTtolL = make_gt_tolerant(GT, FULL_MATCHER_L, off.GT_tolerance)
        _, sad_L = run_sad(
            os.path.join(off.data_dir, off.dataset, off.camera, off.reference),
            os.path.join(off.data_dir, off.dataset, off.camera, off.query),
            GTtolL,
            res.output_folder,
            FULL_MATCHER_L,
            skip=off.filter,
            n_ref=off.reference_places,
            n_query=off.query_places,
        )
        report["sad_at_full_L"] = sad_L
    return report


def find_chip_model(models_dir: str, traverse: str):
    """(name, params, sidecar_meta) of the bundled `chip-{traverse}` sweep
    winner, or None.  The chip checkpoints' architecture can differ from
    the stock model's (the sunset winner is feature_multiplier 16), so the
    name is discovered rather than derived from the traverse config; the
    .config.json sidecar carries the winner's recorded operating point
    (sequence_length/timebin) for the replay."""
    import glob

    hits = sorted(
        glob.glob(os.path.join(models_dir, f"chip-{traverse}_LENS_*.npz"))
    )
    if not hits:
        return None
    name = os.path.splitext(os.path.basename(hits[-1]))[0]
    meta = {}
    sidecar = os.path.join(models_dir, name + ".config.json")
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            meta = json.load(f)
    return name, checkpoint.load_model(models_dir, name), meta


def write_overlay_csv(path: str, report: dict) -> None:
    """The reference's SADvLENS CSV (N,SAD,LENS), extended with the offline
    LENS column so the online-vs-offline cost is visible in one artifact."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        header = ["N", "SAD", "LENS_offline", "LENS_online"]
        chip = report.get("chip_online")
        full = report.get("chip_full_online")
        L = report.get("chip_full_L")
        if chip:
            header.append("LENS_chip_online")
        if full:
            header += [f"SAD_L{L}", f"LENS_chip_full_L{L}"]
        w.writerow(header)
        for i, n in enumerate(report["recall_ns"]):
            row = [
                n, report["sad"][i], report["offline"][i], report["online"][i]
            ]
            if chip:
                row.append(chip[i])
            if full:
                row += [report["sad_at_full_L"][i], full[i]]
            w.writerow(row)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Online-mode Recall@N benchmark")
    p.add_argument("--traverse", default="all", choices=["example", "sunset", "all"])
    p.add_argument("--events_per_bin", type=int, default=EVENTS_PER_BIN)
    p.add_argument(
        "--densities",
        default="",
        help="comma list of extra events/bin values: run an online-accuracy "
        "density sweep on the example traverse (the chip's operating "
        "variable — reference hardware logs ~1e5 events/s)",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--seeds",
        default="",
        help="comma list of extra synthesis seeds: report the online "
        "Recall@1 band across independent stream realizations of the "
        "example traverse (synthesis noise, not pipeline noise — the "
        "pipeline is deterministic per stream)",
    )
    p.add_argument("--json", default="", help="write the JSON report here")
    p.add_argument("--csv_dir", default="", help="write overlay CSVs here")
    p.add_argument("--out", default="", help="run output base (default: temp)")
    args = p.parse_args(argv)

    root = os.path.join(os.path.dirname(__file__), "..", "..")
    out_base = args.out or tempfile.mkdtemp(prefix="online_recall_")
    cfgs = traverse_configs(root, out_base)
    names = ["example", "sunset"] if args.traverse == "all" else [args.traverse]

    reports = []
    for name in names:
        rep = run_traverse(name, cfgs[name], args.events_per_bin, args.seed)
        reports.append(rep)
        rows = [
            ["LENS online", *rep["online"]],
            ["LENS offline", *rep["offline"]],
            ["SAD", *rep["sad"]],
        ]
        if rep.get("chip_online"):
            rows.insert(0, ["LENS chip online", *rep["chip_online"]])
        if rep.get("chip_full_online"):
            L = rep["chip_full_L"]
            rows.insert(0, [f"LENS chip full L={L}", *rep["chip_full_online"]])
            rows.append([f"SAD L={L}", *rep["sad_at_full_L"]])
        print(ascii_table(["N", *map(str, rep["recall_ns"])], rows))
        if args.csv_dir:
            write_overlay_csv(
                os.path.join(args.csv_dir, f"SAD_vs_LENS_online_{name}.csv"), rep
            )
    payload = {"reports": reports}
    if args.densities:
        GT = np.load(gt_path_for(cfgs["example"]["offline"]))
        sweep = []
        for d in [int(x) for x in args.densities.split(",") if x.strip()]:
            row = run_stream_once(cfgs["example"]["stream"], GT, d, args.seed)
            row.pop("_matrix")
            sweep.append(row)
        payload["density_sweep_example"] = sweep
        print(
            ascii_table(
                ["events/bin", *map(str, RECALL_NS)],
                [[r["events_per_bin"], *r["online"]] for r in sweep],
            )
        )
    if args.seeds:
        GT = np.load(gt_path_for(cfgs["example"]["offline"]))
        band = []
        for s in [int(x) for x in args.seeds.split(",") if x.strip()]:
            row = run_stream_once(
                cfgs["example"]["stream"], GT, args.events_per_bin, s
            )
            row.pop("_matrix")
            row["seed"] = s
            band.append(row)
        payload["seed_band_example"] = band
        payload["seed_band_note"] = (
            f"independent stream synthesis seeds at {args.events_per_bin} "
            "events/bin; the pipeline is deterministic per stream (integer "
            f"dynamics), so the band is synthesis noise. Seed {args.seed} "
            "is the headline report row. Generated on the CPU backend: the "
            "streaming path is int32 and backend-identical "
            "(tests/test_stream_oracle.py)."
        )
        r1 = [r["online"][0] for r in band]
        print(f"seed band (R@1 over seeds {args.seeds}): {min(r1)}-{max(r1)}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
