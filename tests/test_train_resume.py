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


def test_interrupted_tp_sharded_training_resumes_sharded(tiny_dataset_cfg, monkeypatch):
    """A resumed --shard_db run must re-establish the 'model'-axis sharding
    on the loaded checkpoint (round-2 review: it previously resumed
    unsharded on one device) and still finish bit-identical."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = replace(tiny_dataset_cfg, epoch_feat=4, epoch_out=4, shard_db=True)
    base = tm.train(cfg, checkpoint_every=2)

    real_scan = tm.train_layer_scan
    calls = {"n": 0}

    def dying_scan(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 4:  # die in the OUTPUT layer's 2nd block (1st is checkpointed)
            raise KeyboardInterrupt("simulated crash")
        return real_scan(*args, **kwargs)

    monkeypatch.setattr(tm, "train_layer_scan", dying_scan)
    with pytest.raises(KeyboardInterrupt):
        tm.train(cfg, checkpoint_every=2)
    monkeypatch.setattr(tm, "train_layer_scan", real_scan)
    # The crash left an OUTPUT-layer checkpoint (the resume-load reshard path).
    ckpt = tm._layer_ckpt_path(cfg.models_dir, cfg.model_name(), "output_layer")
    assert os.path.exists(ckpt)

    seen_shardings = []

    def spying_scan(state, *args, **kwargs):
        seen_shardings.append(str(state.w.sharding))
        return real_scan(state, *args, **kwargs)

    monkeypatch.setattr(tm, "train_layer_scan", spying_scan)
    resumed = tm.train(cfg, checkpoint_every=2, resume=True)
    # The resumed output-layer blocks ran on 'model'-sharded state.
    assert any("model" in s for s in seen_shardings)
    np.testing.assert_array_equal(np.asarray(resumed.w_out), np.asarray(base.w_out))
