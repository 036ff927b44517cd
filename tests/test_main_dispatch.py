"""Mode dispatch of the CLI entry point (reference main.py:40-76)."""

from dataclasses import replace

import main as main_mod


def test_inference_dispatch(tiny_dataset_cfg, monkeypatch):
    called = {}
    import lens_tpu.run_model as rm

    monkeypatch.setattr(rm, "run_inference", lambda cfg: called.setdefault("mode", "infer"))
    main_mod.initialize_and_run_model(tiny_dataset_cfg)
    assert called["mode"] == "infer"


def test_train_dispatch(tiny_dataset_cfg, monkeypatch):
    called = {}
    import lens_tpu.train_model as tm

    monkeypatch.setattr(tm, "run_training", lambda cfg: called.setdefault("mode", "train"))
    main_mod.initialize_and_run_model(replace(tiny_dataset_cfg, train_model=True))
    assert called["mode"] == "train"


def test_event_driven_dispatch(tiny_dataset_cfg, monkeypatch):
    called = {}
    import lens_tpu.runtime.stream as st

    monkeypatch.setattr(st, "run_event_driven", lambda cfg: called.setdefault("mode", "stream"))
    main_mod.initialize_and_run_model(replace(tiny_dataset_cfg, event_driven=True))
    assert called["mode"] == "stream"


def test_collect_dispatch(tiny_dataset_cfg, monkeypatch):
    called = {}
    import lens_tpu.runtime.collect as co

    monkeypatch.setattr(co, "run_collector", lambda cfg: called.setdefault("mode", "collect"))
    main_mod.initialize_and_run_model(replace(tiny_dataset_cfg, collect_data=True))
    assert called["mode"] == "collect"


def test_mode_priority_train_wins(tiny_dataset_cfg, monkeypatch):
    """train_model outranks the other mode flags (main.py:47-76 if/elif)."""
    called = {}
    import lens_tpu.train_model as tm

    monkeypatch.setattr(tm, "run_training", lambda cfg: called.setdefault("mode", "train"))
    cfg = replace(tiny_dataset_cfg, train_model=True, event_driven=True, collect_data=True)
    main_mod.initialize_and_run_model(cfg)
    assert called["mode"] == "train"
