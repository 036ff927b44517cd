"""Accuracy BEYOND parity: a from-scratch LENS-TPU training run beats the
reference's own pretrained checkpoint on the reference's protocol.

Two round-2 changes compound here: the corrected reference weight-init
normalization (one scalar, blitnet.py:164 — round 1 normalized per-row) and
sweep-selected hyperparameters (parallel/sweep.py over the reference's own
optimizer.py search space; best trial of 16 at 32+32 epochs).  Result on the
bundled example protocol (dims=10, timebin=250, seq=2, tol=3):

    reference pretrained : 0.65 / 0.88 / 0.95 / 0.98 / 0.98 / 0.99
    LENS-TPU from scratch: 0.70 / 0.89 / 0.97 / 0.99 / 0.99 / 0.99

i.e. >= the pretrained golden at every N, +5 points at Recall@1.
Deterministic on the CPU backend (seeded init/shuffles, torch-parity
rasters); the floor leaves 2 points of slack for cross-backend f32
training-accumulation differences.
"""

import os
from dataclasses import replace

from lens_tpu.config import LensConfig
from lens_tpu.run_model import run_inference
from lens_tpu.train_model import run_training

SWEPT = dict(fire_l_feat=0.438, fire_h_feat=0.5, thr_h_feat=0.3285714285714286)
PRETRAINED_GOLDEN = [0.65, 0.88, 0.95, 0.98, 0.98, 0.99]


def test_from_scratch_beats_pretrained_reference(tmp_path):
    root = os.path.join(os.path.dirname(__file__), "..")
    cfg = LensConfig(
        **SWEPT,
        epoch_feat=32,
        epoch_out=32,
        data_dir=os.path.join(root, "lens", "dataset") + os.sep,
        models_dir=str(tmp_path / "models"),
        output_base=str(tmp_path / "out"),
    )
    run_training(replace(cfg, train_model=True))
    res = run_inference(replace(cfg, matching=True))
    assert res.recall_at_n[0] >= 0.68, res.recall_at_n
    for ours, theirs in zip(res.recall_at_n[1:], PRETRAINED_GOLDEN[1:]):
        assert ours >= theirs - 0.01, (res.recall_at_n, PRETRAINED_GOLDEN)
