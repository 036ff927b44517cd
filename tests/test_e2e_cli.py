"""End-to-end mode tests on a tiny synthetic dataset: train -> infer ->
artifacts, the quantized sim, and the streaming mode — the whole CLI surface
minus hardware, mirroring the reference's bundled-dataset smoke test role
(SURVEY.md §4)."""

import os

import numpy as np
import pytest
from PIL import Image

from lens_tpu.config import LensConfig


@pytest.fixture(scope="module")
def tiny_dataset(tiny_dataset_cfg):
    """Alias of the session tiny-dataset config (built in conftest.py)."""
    return tiny_dataset_cfg


@pytest.fixture(scope="module")
def tiny_model(tiny_dataset):
    """Ensure a trained checkpoint exists for modes that load one."""
    from dataclasses import replace

    from lens_tpu.train_model import run_training

    path = os.path.join(
        tiny_dataset.models_dir, tiny_dataset.model_name(".npz")
    )
    if not os.path.exists(path):
        run_training(replace(tiny_dataset, train_model=True))
    return path


def test_train_then_infer(tiny_dataset):
    from dataclasses import replace

    from lens_tpu.run_model import run_inference
    from lens_tpu.train_model import run_training

    cfg = replace(tiny_dataset, train_model=True)
    path = run_training(cfg)
    assert os.path.exists(path)
    # Sidecar + legacy .pth both written.
    assert os.path.exists(path.replace(".npz", ".config.json"))

    cfg = replace(tiny_dataset, train_model=False, sim_mat=True, PR_curve=True)
    res = run_inference(cfg)
    assert len(res.recall_at_n) == 6
    assert all(0.0 <= r <= 1.0 for r in res.recall_at_n)
    out = res.output_folder
    for artifact in ("distance_matrix_lens.pdf", "GTtol.pdf", "lens.log"):
        assert os.path.exists(os.path.join(out, artifact)), artifact
    # Machine-readable run summary.
    import json

    with open(os.path.join(out, "metrics.json")) as f:
        metrics = json.load(f)
    assert metrics["queries"] == cfg.query_places
    assert metrics["backend"] == "float"
    assert metrics["recall_at_n"]["1"] == res.recall_at_n[0]
    assert metrics["frames_per_sec"] > 0 and metrics["p50_latency_ms"] > 0
    assert metrics["amortized_latency_ms"] > 0


def test_simulated_speck_mode(tiny_dataset, tiny_model):
    from dataclasses import replace

    from lens_tpu.run_model import run_inference

    cfg = replace(tiny_dataset, simulated_speck=True)
    res = run_inference(cfg)
    assert res.counts is not None
    # Integer chip counts are exactly reproducible.
    res2 = run_inference(cfg)
    np.testing.assert_array_equal(res.counts, res2.counts)


def test_event_driven_mode(tiny_dataset, tiny_model):
    from dataclasses import replace

    from lens_tpu.runtime.stream import run_event_driven

    cfg = replace(tiny_dataset, event_driven=True, save_input=True)
    matcher = run_event_driven(cfg)
    # 8 bins = 2 averaged rows; no full 4-row block yet -> no matrix, but the
    # spike log must exist.
    out_dirs = sorted(os.listdir(cfg.output_base))
    newest = os.path.join(cfg.output_base, out_dirs[-1])
    assert os.path.exists(os.path.join(newest, "spike_data.npy"))
    assert os.path.exists(os.path.join(newest, "power_data.npy"))
    assert os.path.exists(os.path.join(newest, "events"))
    assert matcher is not None


def test_shard_db_mode_matches_dp(tiny_dataset, tiny_model):
    """--shard_db: the TP-sharded database evaluation is reachable from the
    user surface and produces counts identical to the default path (VERDICT
    round-1 ask #4)."""
    import jax
    from dataclasses import replace

    from lens_tpu.run_model import run_inference

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    base = run_inference(replace(tiny_dataset, matching=True))
    tp = run_inference(replace(tiny_dataset, matching=True, shard_db=True))
    np.testing.assert_array_equal(tp.counts, base.counts)
    assert tp.recall_at_n == base.recall_at_n


def test_batch_queries_chunking_bit_identical(tiny_dataset, tiny_model):
    """--batch_queries N chunks the query axis into N-row device programs
    (HBM-limited hosts); the result must be bit-identical to the single
    all-queries program, on the float and the quantized path (VERDICT
    round-2 ask #6: no dead flags in LensConfig)."""
    from dataclasses import replace

    from lens_tpu.run_model import run_inference

    for extra in ({}, {"simulated_speck": True}):
        base = run_inference(replace(tiny_dataset, matching=True, **extra))
        chunked = run_inference(
            replace(tiny_dataset, matching=True, batch_queries=3, **extra)
        )
        np.testing.assert_array_equal(chunked.counts, base.counts)
        assert chunked.recall_at_n == base.recall_at_n


def test_profile_flag_emits_trace(tiny_dataset, tiny_model):
    from dataclasses import replace

    from lens_tpu.run_model import run_inference

    res = run_inference(replace(tiny_dataset, profile=True))
    trace_dir = os.path.join(res.output_folder, "jax_trace")
    assert os.path.isdir(trace_dir)
    # The profiler writes plugin subdirs/files under the trace root.
    assert any(os.scandir(trace_dir))


def test_sad_baseline(tiny_dataset, tmp_path):
    from lens_tpu.metrics.gt import make_gt_tolerant
    from lens_tpu.sad import run_sad

    base = os.path.join(tiny_dataset.data_dir, "tinyset", "cam")
    GT = np.load(os.path.join(base, "ref-trav_qry-trav_GT.npy"))
    GTtol = make_gt_tolerant(GT, 2, 1)
    pr, recalls = run_sad(
        os.path.join(base, "ref-trav"),
        os.path.join(base, "qry-trav"),
        GTtol,
        str(tmp_path),
        sequence_length=2,
    )
    assert len(recalls) == 6
    # SAD on near-identical traverses must be a strong matcher.
    assert recalls[-1] >= 0.5
    assert os.path.exists(tmp_path / "distance_matrix_SAD.pdf")


def test_collect_data_mode(tiny_dataset, tmp_path):
    from dataclasses import replace

    from lens_tpu.runtime.collect import run_collector

    rng = np.random.default_rng(0)
    n_ev = 2000
    t = np.sort(rng.uniform(0, 0.2, n_ev))
    x = rng.integers(23, 23 + 16, n_ev)
    y = rng.integers(0, 16, n_ev)
    ev = np.stack([t, x, y, np.ones(n_ev)], axis=1)
    ev_path = tmp_path / "events.npy"
    np.save(ev_path, ev)

    cfg = replace(
        tiny_dataset, collect_data=True, event_file=str(ev_path), data_name="newdata"
    )
    folder = run_collector(cfg)
    pngs = [f for f in os.listdir(folder) if f.endswith(".png")]
    assert len(pngs) >= 2
    assert os.path.exists(os.path.join(cfg.data_dir, "newdata.csv"))


def test_collect_data_live_stdin(tiny_dataset, monkeypatch):
    """--collect_data --event_file - : frames are written live as each
    stdin-fed timebin completes (the reference's devkit collector-thread
    role, collect_data.py:186-202)."""
    import io
    import sys
    from dataclasses import replace

    from lens_tpu.runtime.collect import run_collector

    rng = np.random.default_rng(5)
    n = 3000
    t = np.sort(rng.uniform(0, 0.1, n))
    x = rng.integers(23, 23 + 16, n)
    y = rng.integers(0, 16, n)
    lines = "128 128\n" + "".join(
        f"{tv:.6f} {xv} {yv} 1\n" for tv, xv, yv in zip(t, x, y)
    )
    monkeypatch.setattr(sys, "stdin", io.StringIO(lines))
    cfg = replace(
        tiny_dataset, collect_data=True, event_file="-", data_name="livedata"
    )
    folder = run_collector(cfg)
    pngs = sorted(f for f in os.listdir(folder) if f.endswith(".png"))
    assert len(pngs) == 5  # 0.1 s / 20 ms bins
    assert os.path.exists(os.path.join(cfg.data_dir, "livedata.csv"))


def test_shard_db_auto_route(tiny_dataset, tiny_model):
    """The auto threshold engages TP without the flag when the DB is large
    enough (here forced low); counts identical to the default path."""
    import jax
    from dataclasses import replace

    from lens_tpu.run_model import run_inference

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    base = run_inference(replace(tiny_dataset, matching=True))
    auto = run_inference(
        replace(tiny_dataset, matching=True, shard_db_auto_places=1)
    )
    np.testing.assert_array_equal(auto.counts, base.counts)


def test_precision_bf16_end_to_end(tiny_dataset, tiny_model):
    """--precision bf16 (MXU-native operand precision, f32 accumulation):
    reachable from the user surface on every float route (single-device, DP,
    TP); counts track the f32 run closely (only the bf16 weight rounding
    differs) and the metrics artifact records the precision."""
    import json
    from dataclasses import replace

    from lens_tpu.run_model import run_inference

    base = run_inference(replace(tiny_dataset, matching=True))
    bf16 = run_inference(replace(tiny_dataset, matching=True, precision="bf16"))
    diff = np.abs(bf16.counts - base.counts)
    assert (diff == 0).mean() > 0.8, (diff.max(), (diff == 0).mean())
    assert len(bf16.recall_at_n) == 6
    with open(os.path.join(bf16.output_folder, "metrics.json")) as f:
        assert json.load(f)["precision"] == "bf16"
    # TP route accepts it too (counts equal ITS f32-TP analogue up to the
    # same weight rounding — here just assert the route runs).
    tp = run_inference(
        replace(tiny_dataset, matching=True, precision="bf16", shard_db=True)
    )
    np.testing.assert_array_equal(tp.counts, bf16.counts)


def test_precision_bf16_rejected_for_quantized_sim(tiny_dataset):
    """The quantized chip simulator's integer-exactness claim is f32-only;
    the checker refuses the combination up front."""
    from dataclasses import replace

    from lens_tpu.checker import check_args

    with pytest.raises(AssertionError, match="bf16"):
        check_args(
            replace(tiny_dataset, simulated_speck=True, precision="bf16")
        )
    with pytest.raises(AssertionError, match="precision"):
        check_args(replace(tiny_dataset, precision="f16"))


def test_save_input_roundtrips_through_frame_rebuild(tiny_dataset, tiny_model, tmp_path):
    """The --save_input per-bin event arrays rebuild into PNG frames via the
    manual_eventframe_generator counterpart (tools/images.py), and the
    rebuilt frames equal the saved (clipped) bins."""
    from dataclasses import replace

    from PIL import Image

    from lens_tpu.runtime.stream import run_event_driven
    from lens_tpu.tools.images import frames_from_event_arrays

    out_base = str(tmp_path / "out")
    run_event_driven(
        replace(tiny_dataset, event_driven=True, save_input=True,
                headless=True, output_base=out_base)
    )
    newest = os.path.join(out_base, sorted(os.listdir(out_base))[-1])
    events_dir = os.path.join(newest, "events")
    rebuilt_dir = str(tmp_path / "rebuilt")
    n = frames_from_event_arrays(
        events_dir, rebuilt_dir, roi_dim=tiny_dataset.roi_dim
    )
    saved = sorted(os.listdir(events_dir))
    assert n == len(saved) > 0
    first = np.load(os.path.join(events_dir, saved[0]))
    png = np.asarray(
        Image.open(os.path.join(rebuilt_dir, sorted(os.listdir(rebuilt_dir))[0]))
    )
    np.testing.assert_array_equal(png, np.clip(first, 0, 255).astype(np.uint8))


def test_collect_data_refuses_stale_frames(tiny_dataset, tmp_path):
    """Re-collecting into a data_name that already holds frames must refuse
    loudly (the checker's existing-dir assert): create_csv_from_images
    enumerates the whole folder, so a stale longer recording would
    silently pad the new CSV with wrong places."""
    from dataclasses import replace

    from lens_tpu.runtime.collect import run_collector

    rng = np.random.default_rng(1)
    n_ev = 500
    t = np.sort(rng.uniform(0, 0.1, n_ev))
    x = rng.integers(23, 23 + 16, n_ev)
    y = rng.integers(0, 16, n_ev)
    np.save(tmp_path / "ev.npy", np.stack([t, x, y, np.ones(n_ev)], axis=1))
    cfg = replace(
        tiny_dataset, collect_data=True,
        event_file=str(tmp_path / "ev.npy"), data_name="reused",
    )
    run_collector(cfg)
    with pytest.raises(AssertionError, match="already exists"):
        run_collector(cfg)


def test_collect_data_live_interrupt_still_writes_csv(tiny_dataset, monkeypatch):
    """Ctrl-C is the normal way to end a live collection; the frames
    already on disk must still get their annotation CSV (try/finally)."""
    from dataclasses import replace

    from lens_tpu.runtime.collect import run_collector

    # A real Ctrl-C raises in the MAIN thread (the consumer loop saving
    # frames), not in the feeder thread — simulate it at the save site
    # after at least one frame is on disk.
    from lens_tpu.runtime import collect as collect_mod

    real_save = collect_mod._save_frame

    def interrupting_save(img_folder, idx, frame):
        real_save(img_folder, idx, frame)
        if idx >= 1:
            raise KeyboardInterrupt

    monkeypatch.setattr(collect_mod, "_save_frame", interrupting_save)
    rng = np.random.default_rng(9)
    n = 3000
    t = np.sort(rng.uniform(0, 0.2, n))
    x = rng.integers(23, 23 + 16, n)
    y = rng.integers(0, 16, n)
    lines = "".join(f"{tv:.6f} {xv} {yv} 1\n" for tv, xv, yv in zip(t, x, y))
    import io
    import sys

    monkeypatch.setattr(sys, "stdin", io.StringIO(lines))
    cfg = replace(
        tiny_dataset, collect_data=True, event_file="-", data_name="livecut"
    )
    with pytest.raises(KeyboardInterrupt):
        run_collector(cfg)
    folder = os.path.join(cfg.data_dir, cfg.dataset, cfg.camera, "livecut")
    pngs = [f for f in os.listdir(folder) if f.endswith(".png")]
    assert len(pngs) >= 1
    csv_path = os.path.join(cfg.data_dir, "livecut.csv")
    assert os.path.exists(csv_path)
    with open(csv_path) as f:
        assert len(f.readlines()) == len(pngs) + 1  # header + one row/frame
