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


def test_bundled_swept_checkpoint_recall():
    """The bundled from-scratch checkpoint (trained-example_*) reproduces the
    beats-reference table exactly — users get the better model out of the
    box via LensModel.from_checkpoint(cfg, "trained-example_...")."""
    import numpy as np

    from lens_tpu.data.dataset import FrameDataset
    from lens_tpu.metrics.gt import make_gt_tolerant
    from lens_tpu.metrics.vpr import recall_at_k
    from lens_tpu.models.lens import LensModel
    from lens_tpu.ops.seqmatch import sequence_conv

    root = os.path.join(os.path.dirname(__file__), "..")
    cfg = LensConfig(
        data_dir=os.path.join(root, "lens", "dataset") + os.sep,
        models_dir=os.path.join(root, "lens", "models"),
    )
    m = LensModel.from_checkpoint(cfg, "trained-example_LENS_IN100_FN200_DB100.pth")
    ds = FrameDataset.load(
        os.path.join(cfg.data_dir, "example-query.csv"),
        os.path.join(cfg.data_dir, "example", "davis128", "example-query"),
        max_samples=100,
    )
    counts = m.spike_counts(ds.query_intensities_downsampled(10))
    dist = np.asarray(sequence_conv(counts.astype(np.float64), 2))
    GT = np.load(
        os.path.join(
            cfg.data_dir, "example", "davis128", "example-reference_example-query_GT.npy"
        )
    )
    GTtol = make_gt_tolerant(GT, 2, 3)
    R = [round(recall_at_k(dist, GTtol, K=k), 2) for k in (1, 5, 10, 15, 20, 25)]
    assert R == [0.7, 0.89, 0.97, 0.99, 0.99, 0.99]
