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


def test_optimizer_cli_entry(tiny_dataset_cfg):
    """The optimizer.py CLI end-to-end (reference optimizer.py:204 role)."""
    import optimizer

    cfg = tiny_dataset_cfg
    res = optimizer.run_cli(
        [
            "--dataset", cfg.dataset,
            "--camera", cfg.camera,
            "--reference", cfg.reference,
            "--query", cfg.query,
            "--data_dir", cfg.data_dir,
            "--reference_places", str(cfg.reference_places),
            "--query_places", str(cfg.query_places),
            "--sequence_length", str(cfg.sequence_length),
            "--GT_tolerance", str(cfg.GT_tolerance),
            "--timebin", str(cfg.timebin),
            "--dims", str(cfg.dims),
            "--roi_dim", str(cfg.roi_dim),
            "--epoch_feat", "2",
            "--epoch_out", "2",
            "--raster_mode", "jax",
            "--models_dir", cfg.models_dir,
            "--output_base", cfg.output_base,
            "--n_trials", "2",
        ]
    )
    assert res.recalls.shape == (2, 6)


def test_run_sweep_tiny(tiny_dataset_cfg, tmp_path):
    cfg = replace(tiny_dataset_cfg, epoch_feat=2, epoch_out=2)
    res = run_sweep(cfg, n_trials=3, seed=0, output_folder=str(tmp_path))
    assert res.recalls.shape == (3, 6)
    assert res.auc.shape == (3,)
    assert 0 <= res.best < 3
    assert os.path.exists(tmp_path / "sweep_results.json")


def test_mesh_sharded_sweep_matches_unsharded(tiny_dataset_cfg):
    """VERDICT round-1 ask #5: the trial axis shards across the (virtual
    8-device) mesh; results must equal the single-device vmapped sweep
    exactly — partitioning the batch axis never splits a reduction, so the
    f32 sums are bit-identical.  Also exercises trial padding (3 % 8 != 0)."""
    import jax

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    cfg = replace(tiny_dataset_cfg, epoch_feat=2, epoch_out=2)
    sharded = run_sweep(cfg, n_trials=3, seed=0, shard_trials=True)
    unsharded = run_sweep(cfg, n_trials=3, seed=0, shard_trials=False)
    np.testing.assert_array_equal(sharded.recalls, unsharded.recalls)
    np.testing.assert_array_equal(sharded.auc, unsharded.auc)
    assert sharded.best == unsharded.best
    assert len(sharded.trials) == 3  # padding dropped from results
