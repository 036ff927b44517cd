"""Single typed configuration for the whole framework.

The reference duplicates its argparse schema in two places with divergent
defaults and missing flags (reference: main.py:78-192 and optimizer.py:106-202;
optimizer.py is missing --nocuda/--sim_mat/--PR_curve/--sad/--GT_tolerance which
breaks `LENS.__init__`).  Here there is exactly one schema: the
:class:`LensConfig` dataclass.  The CLI parser is generated from it, so the
flags can never drift, and every reference flag is preserved verbatim.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field, fields
from typing import Optional


@dataclass
class LensConfig:
    """Every knob of the framework, defaults matching reference main.py:85-186."""

    # --- dataset (reference main.py:85-104) ---
    dataset: str = "example"
    camera: str = "davis128"
    data_name: str = "experiment001"
    reference: str = "example-reference"
    query: str = "example-query"
    data_dir: str = "./lens/dataset/"
    reference_places: int = 100
    query_places: int = 100
    sequence_length: int = 2
    feature_multiplier: float = 2.0

    # --- training schedule (reference main.py:107-112) ---
    filter: int = 1
    epoch_feat: int = 128
    epoch_out: int = 128

    # --- feature-layer hyperparameters (reference main.py:115-126) ---
    thr_l_feat: float = 0.0
    thr_h_feat: float = 0.75
    fire_l_feat: float = 0.4
    fire_h_feat: float = 0.6
    ip_rate_feat: float = 0.02
    stdp_rate_feat: float = 0.01

    # --- output-layer hyperparameters (reference main.py:129-140) ---
    thr_l_out: float = 0.0
    thr_h_out: float = 0.5
    fire_l_out: float = 0.5
    fire_h_out: float = 0.5
    ip_rate_out: float = 0.02
    stdp_rate_out: float = 0.01

    # --- connection probabilities (reference main.py:143-150) ---
    f_exc: float = 0.35
    f_inh: float = 0.75
    o_exc: float = 1.0
    o_inh: float = 1.0

    # --- image geometry (reference main.py:153-156) ---
    dims: int = 10
    roi_dim: int = 80

    # --- mode / evaluation flags (reference main.py:159-186) ---
    train_model: bool = False
    GT_tolerance: int = 3
    sim_mat: bool = False
    PR_curve: bool = False
    matching: bool = False
    sad: bool = False
    timebin: int = 250
    nocuda: bool = False
    event_driven: bool = False
    simulated_speck: bool = False
    collect_data: bool = False
    headless: bool = False
    save_input: bool = False

    # --- DVS front-end (chip constants the reference hardcodes into the
    # devkit — run_speck.py:258-271 — surfaced as config for the simulator) ---
    hot_pixel_rate: int = 5  # chip dvs_filter.threshold, events/ms (0 = off)
    roi_x: int = 23  # ROI origin x (run_speck.py:268-269: cut (23,0)-(102,79))
    roi_y: int = 0  # ROI origin y

    # --- TPU-native additions (no reference counterpart) ---
    raster_mode: str = "torch-parity"  # 'torch-parity' | 'jax' — see ops/raster.py
    raster_seed: int = 50  # reference dataset.py:120 uses torch.manual_seed(50)
    min_v_mem: float = -1.0  # sinabs from_model default membrane floor
    batch_queries: int = 0  # 0 = all queries in one device program
    train_seed: int = 0  # shuffle seed for the STDP sample stream
    models_dir: str = "./lens/models"
    output_base: str = "./lens/output"
    event_file: str = ""  # event stream file for --event_driven replay
    stream_chunk_bins: int = 8  # recorded replay: bins per device dispatch
    # (bit-identical to per-bin — tests/test_stream.py — and ~3x the replay
    # throughput by amortizing dispatch roundtrips; live stdin is always
    # per-bin regardless, so latency is unaffected)
    profile: bool = False  # emit JAX profiler trace + frames/sec report
    shard_db: bool = False  # force TP-sharding of the place/database axis
    shard_db_auto_places: int = 65536  # auto-TP when reference_places >= this
    precision: str = "f32"  # 'f32' | 'bf16' — GEMM operand precision (float path)
    online_matcher: str = "block"  # 'block' (run_speck parity) | 'full'
    resume: bool = False  # --train_model: continue from the last block checkpoint

    # --- derived (filled by __post_init__) ---
    input: int = field(init=False, default=0)
    feature: int = field(init=False, default=0)
    output: int = field(init=False, default=0)
    kernel_size: int = field(init=False, default=0)

    def __post_init__(self) -> None:
        # Layer architecture, reference run_model.py:78-80.
        self.input = int(self.dims * self.dims)
        self.feature = int(self.input * self.feature_multiplier)
        self.output = int(self.reference_places)
        # Center-pixel kernel, reference run_model.py:101.
        self.kernel_size = self.roi_dim // self.dims

    # -- DVS front-end accessors: the single route from config to the
    # accumulation engines (native C++, numpy fallback, device scatter-add)
    @property
    def roi_origin(self) -> tuple:
        return (self.roi_x, self.roi_y)

    def hot_cap(self) -> int:
        """Per-bin hot-pixel cap: the chip's per-ms rate threshold scaled to
        this config's timebin (the one scaling rule, events_native.
        hot_pixel_cap).  0 when the filter is disabled (hot_pixel_rate=0)."""
        if self.hot_pixel_rate <= 0:
            return 0
        from lens_tpu.runtime.events_native import hot_pixel_cap

        return hot_pixel_cap(self.timebin / 1000.0, self.hot_pixel_rate)

    # -- model name scheme, reference main.py:27-38 ("..._LENS_IN{n}_FN{n}_DB{n}.pth")
    def model_name(self, suffix: str = ".pth") -> str:
        return (
            f"{self.reference}_LENS_IN{self.input}_FN{self.feature}"
            f"_DB{self.reference_places}{suffix}"
        )

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_dict(cls, d: dict) -> "LensConfig":
        init_names = {f.name for f in fields(cls) if f.init}
        return cls(**{k: v for k, v in d.items() if k in init_names})


_HELP = {
    "dataset": "Dataset to use for training and/or inferencing",
    "camera": "Camera to use for training and/or inferencing",
    "data_name": "Define dataset name for data collection",
    "reference": "Reference traverse name",
    "query": "Query traverse name",
    "data_dir": "Directory where dataset files are stored",
    "reference_places": "Number of places in the reference traverse",
    "query_places": "Number of places in the query traverse",
    "sequence_length": "Length of the sequence matcher",
    "feature_multiplier": "Size multiplier for the feature/hidden layer",
    "filter": "Images to skip for training and/or inferencing",
    "timebin": "dt for spike collection window and time-based simulation",
    "dims": "Dimensions to resize the image to",
    "roi_dim": "Input dimensions for the network",
    "train_model": "Train a new model instead of running inference",
    "GT_tolerance": "Tolerance for GT matching",
    "sim_mat": "Plot a similarity matrix",
    "PR_curve": "Plot a precision recall curve",
    "matching": "Perform matching to GT, if available",
    "sad": "Perform SAD matching",
    "nocuda": "Force CPU in the reference; kept for CLI parity (no-op on TPU)",
    "event_driven": "Run the online streaming VPR model",
    "simulated_speck": "Run the bit-accurate quantized Speck simulation",
    "collect_data": "Collect event frames to train a new model",
    "headless": "Run the streaming mode without visualization",
    "save_input": "Save the input spikes as NumPy arrays",
    "hot_pixel_rate": "DVS hot-pixel filter rate threshold, events/ms (0 disables)",
    "roi_x": "DVS ROI crop origin x (sensor coords)",
    "roi_y": "DVS ROI crop origin y (sensor coords)",
    "raster_mode": "'torch-parity' (bitwise reference rasters) or 'jax' (native PRNG)",
    "batch_queries": "Chunk the query axis into N-row device programs "
    "(0 = all queries at once); bit-identical, for HBM-limited hosts",
    "stream_chunk_bins": "Recorded-stream replay: process N timebins per "
    "device dispatch (bit-identical; ~3x replay throughput at the default 8; "
    "live stdin stays per-bin; set 1 to force per-bin dispatch)",
    "shard_db": "Shard the reference-place (database) axis across all chips (TP)",
    "shard_db_auto_places": "Auto-enable --shard_db at this database size",
    "precision": "GEMM operand precision for float inference: 'f32' (default) "
    "or 'bf16' (MXU-native, ~2x matmul throughput on GEMM-bound models; "
    "weights rounded to bf16, accumulation stays f32)",
    "resume": "Resume an interrupted --train_model run from its last "
    "epoch-block checkpoint (bit-identical to an uninterrupted run)",
    "online_matcher": "Streaming sequence matcher: 'block' (reference "
    "run_speck.py 4-query block protocol) or 'full' (incremental full-matrix "
    "valid conv — offline-pipeline accuracy live; windows beyond L~7 keep "
    "helping, unlike the block protocol)",
}


def build_arg_parser() -> argparse.ArgumentParser:
    """Generate the CLI from LensConfig — one schema, no drift."""
    parser = argparse.ArgumentParser(
        description="LENS-TPU: event-camera visual place recognition on TPU"
    )
    for f in fields(LensConfig):
        if not f.init:
            continue
        name = f"--{f.name}"
        help_text = _HELP.get(f.name, f.name.replace("_", " "))
        if f.type in ("bool", bool):
            parser.add_argument(name, action="store_true", help=help_text)
        else:
            ftype = {"int": int, "float": float, "str": str}.get(str(f.type), None)
            if ftype is None:
                ftype = f.type if callable(f.type) else str
            parser.add_argument(name, type=ftype, default=f.default, help=help_text)
    return parser


def config_from_args(argv: Optional[list] = None) -> LensConfig:
    args = build_arg_parser().parse_args(argv)
    return LensConfig.from_dict(vars(args))
