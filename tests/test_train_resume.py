"""Failure recovery: an interrupted training run resumes from its last
block checkpoint and finishes BIT-IDENTICAL to an uninterrupted run
(SURVEY §5: the reference has no mid-run checkpoint or resume at all)."""

import os
from dataclasses import replace

import numpy as np
import pytest

import lens_tpu.train_model as tm


def test_interrupted_training_resumes_bit_exact(tiny_dataset_cfg, monkeypatch):
    cfg = replace(tiny_dataset_cfg, epoch_feat=4, epoch_out=4)

    base = tm.train(cfg, checkpoint_every=2)

    # Interrupt after the FIRST epoch block has been checkpointed: the
    # second train_layer_scan invocation dies mid-run.
    real_scan = tm.train_layer_scan
    calls = {"n": 0}

    def dying_scan(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 2:
            raise KeyboardInterrupt("simulated crash mid-training")
        return real_scan(*args, **kwargs)

    monkeypatch.setattr(tm, "train_layer_scan", dying_scan)
    with pytest.raises(KeyboardInterrupt):
        tm.train(cfg, checkpoint_every=2)
    monkeypatch.setattr(tm, "train_layer_scan", real_scan)

    # The crash left a feature-layer block checkpoint behind.
    ckpt = tm._layer_ckpt_path(cfg.models_dir, cfg.model_name(), "feature_layer")
    assert os.path.exists(ckpt)
    loaded = tm.load_layer_state(ckpt)
    assert loaded is not None and loaded[1] == 2  # resumes at epoch 2

    resumed = tm.train(cfg, checkpoint_every=2, resume=True)
    np.testing.assert_array_equal(np.asarray(resumed.w_feat), np.asarray(base.w_feat))
    np.testing.assert_array_equal(np.asarray(resumed.w_out), np.asarray(base.w_out))
    np.testing.assert_array_equal(np.asarray(resumed.thr_out), np.asarray(base.thr_out))
    # Completion removed the resume points.
    assert not os.path.exists(ckpt)
