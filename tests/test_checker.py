import os
from dataclasses import replace

import pytest

from lens_tpu import checker


def test_valid_config_passes(tiny_dataset_cfg):
    checker.check_args(tiny_dataset_cfg)


def test_missing_dataset_dir(tiny_dataset_cfg):
    cfg = replace(tiny_dataset_cfg, dataset="nope")
    with pytest.raises(AssertionError, match="Data directory does not exist"):
        checker.check_args(cfg)


def test_missing_query_dir_only_checked_for_inference(tiny_dataset_cfg):
    cfg = replace(tiny_dataset_cfg, query="nope")
    with pytest.raises(AssertionError, match="Query directory"):
        checker.check_args(cfg)
    # Training doesn't need the query traverse (checker.py:10-11).
    checker.check_args(replace(cfg, train_model=True))


def test_not_enough_reference_images(tiny_dataset_cfg):
    cfg = replace(tiny_dataset_cfg, reference_places=10_000)
    with pytest.raises(AssertionError, match="Not enough reference images"):
        checker.check_args(cfg)


def test_filter_multiplies_requirement(tiny_dataset_cfg):
    # 8 images, 8 places x filter 2 = 16 needed.
    cfg = replace(tiny_dataset_cfg, filter=2)
    with pytest.raises(AssertionError, match="Not enough"):
        checker.check_args(cfg)


def test_collect_data_refuses_existing_target(tiny_dataset_cfg):
    cfg = replace(tiny_dataset_cfg, collect_data=True, data_name="ref-trav")
    with pytest.raises(AssertionError, match="already exists"):
        checker.check_args(cfg)


def test_roi_dims_compatibility(tiny_dataset_cfg):
    # roi 16 dims 5 -> k=3; (16-3)//3+1 = 5 == dims -> OK (like the torch probe)
    checker.check_args(replace(tiny_dataset_cfg, dims=5))
    # roi 16 dims 6 -> k=2; (16-2)//2+1 = 8 != 6 -> incompatible
    with pytest.raises(AssertionError, match="incompatible"):
        checker.check_args(replace(tiny_dataset_cfg, dims=6))


def test_vpr_metrics_edge_cases():
    import numpy as np

    from lens_tpu.metrics.vpr import create_pr, recall_at_k

    # All-zero similarity: recall@K still defined (ties broken by argsort).
    S = np.zeros((4, 4))
    GT = np.eye(4, dtype=int)
    r = recall_at_k(S, GT, K=4)
    assert r == 1.0  # top-4 of 4 rows always contains the match
    # No GT matches at all.
    assert recall_at_k(S, np.zeros((4, 4), int), K=1) == 0.0
    # create_pr with a query column that has no GT entry.
    GT2 = np.zeros((3, 3), int)
    GT2[0, 0] = 1
    P, R, _ = create_pr(np.random.default_rng(0).random((3, 3)), GT2)
    assert np.isfinite(P).all() and np.isfinite(R).all()


def test_missing_event_file_rejected(tiny_dataset_cfg):
    from dataclasses import replace

    from lens_tpu import checker

    cfg = replace(tiny_dataset_cfg, event_driven=True, event_file="/no/such/stream.npy")
    with pytest.raises(AssertionError, match="Event file does not exist"):
        checker.check_args(cfg)
