"""Vmapped sweep end-to-end on the tiny synthetic dataset."""

import os
from dataclasses import replace

import numpy as np

from lens_tpu.parallel.sweep import run_sweep, sample_search_space


def test_sample_search_space_grid():
    rng = np.random.default_rng(0)
    trials = sample_search_space(rng, 16)
    assert len(trials) == 16
    for t in trials:
        assert 0.1 <= t["fire_l_feat"] <= 0.49
        assert 0.5 <= t["fire_h_feat"] <= 1.0
        assert 0.1 <= t["thr_h_feat"] <= 0.5


def test_run_sweep_tiny(tiny_dataset_cfg, tmp_path):
    cfg = replace(tiny_dataset_cfg, epoch_feat=2, epoch_out=2)
    res = run_sweep(cfg, n_trials=3, seed=0, output_folder=str(tmp_path))
    assert res.recalls.shape == (3, 6)
    assert res.auc.shape == (3,)
    assert 0 <= res.best < 3
    assert os.path.exists(tmp_path / "sweep_results.json")
