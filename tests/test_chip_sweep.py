"""Chip-regime sweep (tools/chip_sweep.py) — the bundled best-online model.

The sweep selects hyperparameters by ONLINE accuracy at the 10/2 chip
thresholds (the reference paper's hardware-sweep role).  CI does not
retrain; it pins the SHIPPED winner: the committed
chip-example checkpoint, streamed through the exact evaluation stack the
sweep used (deterministic: seeded synthesis + integer dynamics), must beat
the threshold-compensated pretrained model online — the claim the model
ships under (CHIP_SWEEP.json, BENCHMARKS.md)."""

import json
import os

import numpy as np

from lens_tpu.tools.chip_sweep import build_stream_rasters, stream_eval
from lens_tpu.tools.online_recall import (
    EVENTS_PER_BIN,
    gt_path_for,
    traverse_configs,
)
from lens_tpu.utils import checkpoint

ROOT = os.path.join(os.path.dirname(__file__), "..")


def test_shipped_chip_model_beats_pretrained_online():
    cfgs = traverse_configs(ROOT, "/tmp/chip_sweep_test_out")
    stream_cfg = cfgs["example"]["stream"]
    GT = np.load(gt_path_for(stream_cfg))
    rasters = build_stream_rasters(stream_cfg, EVENTS_PER_BIN, seed=0)

    chip_name = stream_cfg.model_name().replace(
        stream_cfg.reference, "chip-example", 1
    )
    chip = checkpoint.load_model(stream_cfg.models_dir, chip_name)
    pretrained = checkpoint.load_model(
        stream_cfg.models_dir, stream_cfg.model_name()
    )

    chip_recalls, chip_auc = stream_eval(chip, rasters, GT, stream_cfg)
    base_recalls, base_auc = stream_eval(pretrained, rasters, GT, stream_cfg)

    # Deterministic pipeline: the shipped numbers reproduce exactly.
    assert chip_recalls[0] >= 0.6, chip_recalls
    assert chip_recalls[0] > base_recalls[0]
    assert chip_auc > base_auc

    # The committed sweep record must agree with the live evaluation.
    committed = os.path.join(ROOT, "CHIP_SWEEP.json")
    if os.path.exists(committed):
        data = json.load(open(committed))
        assert data["results"][data["best"]]["online"] == chip_recalls, (
            "CHIP_SWEEP.json is stale: regenerate with `make chip-sweep`"
        )
