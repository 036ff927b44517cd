import logging
import os

import numpy as np
import pytest

from lens_tpu.config import LensConfig
from lens_tpu.core.network import params_from_numpy
from lens_tpu.runtime.speck_sim import discretize
from lens_tpu.runtime.stream import (
    STREAM_THRESHOLDS,
    OnlineMatcher,
    even_spread_raster,
    rasterize_bin_events,
    stream_forward_counts,
    stream_forward_counts_carry,
)


def _newest_run_dir(out_base):
    """Newest run dir by mtime — run-dir names are %d%m%y-%H-%M-%S
    (day-first), which misorders lexicographically across month
    boundaries (same fix as bench.py's live-stream section)."""
    return os.path.join(
        out_base,
        max(os.listdir(out_base),
            key=lambda d: os.path.getmtime(os.path.join(out_base, d))),
    )


@pytest.fixture
def qparams():
    rng = np.random.default_rng(0)
    params = params_from_numpy(
        np.abs(rng.normal(0, 0.3, (16, 32))).astype(np.float32),
        np.abs(rng.normal(0, 0.3, (32, 8))).astype(np.float32),
        np.zeros(32, np.float32),
        np.zeros(8, np.float32),
    )
    return discretize(params, STREAM_THRESHOLDS)


def test_stream_forward_preserves_input_counts(qparams):
    # The deterministic spreading must deliver exactly the per-pixel counts.
    counts_in = np.array([[3, 0, 7, 1] + [0] * 12], np.int32)
    out = np.asarray(stream_forward_counts(qparams, counts_in, steps=5))
    assert out.shape == (1, 8)
    assert (out >= 0).all()


def test_stream_forward_deterministic(qparams):
    counts_in = np.random.default_rng(1).integers(0, 20, (3, 16)).astype(np.int32)
    a = np.asarray(stream_forward_counts(qparams, counts_in, steps=10))
    b = np.asarray(stream_forward_counts(qparams, counts_in, steps=10))
    np.testing.assert_array_equal(a, b)


def test_even_spread_raster_preserves_totals():
    counts = np.array([3, 0, 7, 250, 1], np.int64)
    r = even_spread_raster(counts, 250)
    assert r.shape == (250, 5)
    np.testing.assert_array_equal(r.sum(axis=0), counts)
    # the 250-count pixel fires exactly once per substep
    np.testing.assert_array_equal(r[:, 3], np.ones(250, np.int32))


def test_rasterize_events_matches_even_spread_on_uniform_streams():
    """A perfectly uniform stream must land in exactly the substeps the
    even-spread formula picks — the AER path generalizes the even-spread
    path.  The even-spread formula emits event k at the END of its 1/c
    interval (the substep where the cumulative floor increments), so uniform
    events are placed just before their interval boundary."""
    S, n_in, timebin = 8, 4, 0.2
    counts = np.array([8, 4, 2, 0], np.int64)  # all divide S
    eps = 1e-9
    t_rel, pix = [], []
    for p, c in enumerate(counts):
        for k in range(c):
            t_rel.append(((k + 1) / c - eps) * timebin)
            pix.append(p)
    aer = rasterize_bin_events(
        np.array(t_rel), np.array(pix), timebin, S, n_in, hot_cap=0
    )
    np.testing.assert_array_equal(aer, even_spread_raster(counts, S))


def test_rasterize_events_hot_cap_keeps_earliest():
    S, n_in, timebin = 4, 2, 1.0
    # 6 events on pixel 0 spread over the bin; cap 3 keeps the first 3
    t_rel = np.array([0.05, 0.3, 0.55, 0.8, 0.85, 0.9])
    pix = np.zeros(6, np.int64)
    r = rasterize_bin_events(t_rel, pix, timebin, S, n_in, hot_cap=3)
    np.testing.assert_array_equal(r[:, 0], [1, 1, 1, 0])
    assert r[:, 1].sum() == 0


def test_carry_forward_equals_concatenated_scan(qparams):
    """Membrane persistence: streaming two bins through the carry API must
    equal one scan over the concatenated raster (the chip never resets)."""
    rng = np.random.default_rng(3)
    r1 = rng.integers(0, 4, (10, 16)).astype(np.int32)
    r2 = rng.integers(0, 4, (10, 16)).astype(np.int32)
    import jax.numpy as jnp

    v2 = jnp.zeros((32,), jnp.int32)
    v3 = jnp.zeros((8,), jnp.int32)
    c1, v2, v3, _ = stream_forward_counts_carry(qparams, jnp.asarray(r1), v2, v3)
    c2, v2, v3, _ = stream_forward_counts_carry(qparams, jnp.asarray(r2), v2, v3)
    both, _, _, _ = stream_forward_counts_carry(
        qparams,
        jnp.asarray(np.concatenate([r1, r2])),
        jnp.zeros((32,), jnp.int32),
        jnp.zeros((8,), jnp.int32),
    )
    np.testing.assert_array_equal(np.asarray(c1) + np.asarray(c2), np.asarray(both))


def test_carry_zero_init_matches_legacy_wrapper(qparams):
    """The Q=1 legacy even-spread forward and the carry API agree bin-one."""
    counts = np.array([[3, 0, 7, 1] + [0] * 12], np.int32)
    legacy = np.asarray(stream_forward_counts(qparams, counts, steps=5))[0]
    import jax.numpy as jnp

    carry, _, _, _ = stream_forward_counts_carry(
        qparams,
        jnp.asarray(even_spread_raster(counts[0].astype(np.int64), 5)),
        jnp.zeros((32,), jnp.int32),
        jnp.zeros((8,), jnp.int32),
    )
    np.testing.assert_array_equal(legacy, np.asarray(carry))


def test_online_matcher_groups_and_matrix(tmp_path):
    logger = logging.getLogger("test-matcher")
    m = OnlineMatcher(
        n_places=10, sequence_length=2, output_folder=str(tmp_path), logger=logger
    )
    rng = np.random.default_rng(0)
    # 4 bins -> 1 row; 4 rows -> 1 matching block: need 16 bins per block.
    for _ in range(32):
        m.push(rng.integers(0, 5, 10))
    assert m.matrix is not None
    assert m.matrix.shape == (10, 8)  # two blocks of 4 columns
    assert len(m.matches) == 8
    assert (tmp_path / "similarity_matrix.npy").exists()
    saved = np.load(tmp_path / "similarity_matrix.npy")
    assert saved.shape == (8, 10)  # saved transposed (run_speck.py:219)


def test_online_matcher_cumulative_rows(tmp_path):
    logger = logging.getLogger("test-matcher2")
    m = OnlineMatcher(
        n_places=4, sequence_length=1, output_folder=str(tmp_path), logger=logger
    )
    # Row 1: integer mean of the first 4 bins (run_speck.py:195).
    for v in ([4, 0, 0, 0], [4, 0, 0, 0], [5, 0, 0, 0], [6, 0, 0, 0]):
        m.push(np.array(v))
    assert len(m._rows) == 1
    np.testing.assert_array_equal(m._rows[0], [4, 0, 0, 0])  # 19//4
    # Reference quirk: the accumulator is NOT cleared between rows
    # (run_speck.py:221 resets only after a full 4-row block), so row 2
    # includes row 1's bins: (19 + 4*1)//4 = 5.
    for _ in range(4):
        m.push(np.array([1, 0, 0, 0]))
    assert len(m._rows) == 2
    np.testing.assert_array_equal(m._rows[1], [5, 0, 0, 0])


def test_rasterize_events_fuzz_totals_and_cap():
    """Property fuzz: for random streams, (a) uncapped AER rasters preserve
    every event, (b) capped rasters equal min(count, cap) per pixel, and
    (c) per-substep values are nonnegative."""
    rng = np.random.default_rng(42)
    for _ in range(20):
        n = int(rng.integers(0, 500))
        n_in = int(rng.integers(1, 30))
        S = int(rng.integers(1, 40))
        timebin = float(rng.uniform(0.01, 2.0))
        t_rel = rng.uniform(0, timebin, n)
        pix = rng.integers(0, n_in, n)
        r = rasterize_bin_events(t_rel, pix, timebin, S, n_in, hot_cap=0)
        totals = np.bincount(pix, minlength=n_in)
        np.testing.assert_array_equal(r.sum(axis=0), totals)
        cap = int(rng.integers(1, 10))
        rc = rasterize_bin_events(t_rel, pix, timebin, S, n_in, hot_cap=cap)
        np.testing.assert_array_equal(rc.sum(axis=0), np.minimum(totals, cap))
        assert (rc >= 0).all() and (r >= 0).all()


def test_batched_carry_matches_per_stream(qparams):
    """stream_forward_counts_carry_batched must equal B independent
    single-stream carries bit-for-bit (vmap adds a batch axis only)."""
    from lens_tpu.runtime.stream import stream_forward_counts_carry_batched
    import jax.numpy as jnp

    rng = np.random.default_rng(6)
    for b in (1, 3, 5):
        rasters = rng.integers(0, 4, (b, 12, 16)).astype(np.int32)
        vf0 = rng.integers(-5, 5, (b, 32)).astype(np.int32)
        vo0 = rng.integers(-5, 5, (b, 8)).astype(np.int32)
        cb, vfb, vob, fb = stream_forward_counts_carry_batched(
            qparams, jnp.asarray(rasters), jnp.asarray(vf0), jnp.asarray(vo0)
        )
        for i in range(b):
            c, vf, vo, f = stream_forward_counts_carry(
                qparams, jnp.asarray(rasters[i]),
                jnp.asarray(vf0[i]), jnp.asarray(vo0[i]),
            )
            np.testing.assert_array_equal(np.asarray(cb)[i], np.asarray(c))
            np.testing.assert_array_equal(np.asarray(vfb)[i], np.asarray(vf))
            np.testing.assert_array_equal(np.asarray(vob)[i], np.asarray(vo))
            assert int(np.asarray(fb)[i]) == int(f)


def test_interrupted_stream_flushes_artifacts(tiny_dataset_cfg, monkeypatch, tmp_path):
    """A crash mid-stream must still leave spike_data/power_data current
    (the periodic-flush schedule replaced an implicitly crash-durable
    per-bin save; the finally block restores that property)."""
    import os
    from dataclasses import replace

    import lens_tpu.runtime.stream as sm

    # Ensure a model exists for the tiny config.
    from lens_tpu.train_model import run_training

    # stream_chunk_bins=1: this test mocks the PER-BIN dispatch function to
    # die mid-stream (the chunked default routes through the multi-bin
    # program, whose crash path test_consumer_crash_mid_drain covers).
    cfg = replace(tiny_dataset_cfg, event_driven=True, headless=True,
                  stream_chunk_bins=1, output_base=str(tmp_path / "out"))
    model_path = os.path.join(cfg.models_dir, cfg.model_name(".npz"))
    if not os.path.exists(model_path):
        run_training(replace(cfg, train_model=True, event_driven=False))

    real = sm.stream_forward_counts_carry
    calls = {"n": 0}

    def dying(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 4:
            raise RuntimeError("simulated device failure at bin 4")
        return real(*args, **kwargs)

    monkeypatch.setattr(sm, "stream_forward_counts_carry", dying)
    with pytest.raises(RuntimeError):
        sm.run_event_driven(cfg)

    out_dir = sorted((tmp_path / "out").iterdir())[-1]
    spikes = np.load(out_dir / "spike_data.npy")
    assert spikes.shape[0] == 3  # bins completed before the crash
    assert (out_dir / "power_data.npy").exists()


def test_multi_bin_carry_matches_sequential(qparams):
    """stream_forward_counts_carry_multi (K bins per dispatch, the
    recorded-replay fast path) must equal K sequential single-bin carries
    bit-for-bit, including the membrane handoff and per-bin feat totals;
    trailing zero-raster padding must leave the carry unchanged."""
    import jax.numpy as jnp

    from lens_tpu.runtime.stream import stream_forward_counts_carry_multi

    rng = np.random.default_rng(7)
    for k in (1, 4, 7):
        rasters = rng.integers(0, 4, (k, 12, 16)).astype(np.int32)
        vf = jnp.zeros((32,), jnp.int32)
        vo = jnp.zeros((8,), jnp.int32)
        cm, vfm, vom, fm = stream_forward_counts_carry_multi(
            qparams, jnp.asarray(rasters), vf, vo
        )
        seq_counts, seq_feats = [], []
        for i in range(k):
            c, vf, vo, f = stream_forward_counts_carry(
                qparams, jnp.asarray(rasters[i]), vf, vo
            )
            seq_counts.append(np.asarray(c))
            seq_feats.append(int(f))
        np.testing.assert_array_equal(np.asarray(cm), np.stack(seq_counts))
        np.testing.assert_array_equal(np.asarray(vfm), np.asarray(vf))
        np.testing.assert_array_equal(np.asarray(vom), np.asarray(vo))
        np.testing.assert_array_equal(np.asarray(fm), np.asarray(seq_feats))
        # Zero-raster padding: membranes unchanged, zero counts.
        padded = np.concatenate([rasters, np.zeros((2, 12, 16), np.int32)])
        cp, vfp, vop, _ = stream_forward_counts_carry_multi(
            qparams, jnp.asarray(padded), jnp.zeros((32,), jnp.int32),
            jnp.zeros((8,), jnp.int32),
        )
        np.testing.assert_array_equal(np.asarray(cp)[:k], np.stack(seq_counts))
        np.testing.assert_array_equal(np.asarray(cp)[k:], 0)
        np.testing.assert_array_equal(np.asarray(vfp), np.asarray(vf))
        np.testing.assert_array_equal(np.asarray(vop), np.asarray(vo))


def test_chunked_replay_bit_identical_to_per_bin(tiny_dataset_cfg, tmp_path):
    """--stream_chunk_bins N on a recorded stream produces bit-identical
    artifacts (spike_data.npy, matches) to the default per-bin replay —
    only the dispatch granularity changes."""
    from dataclasses import replace

    from lens_tpu.runtime.stream import run_event_driven
    from lens_tpu.tools.make_event_stream import synthesize_events
    from lens_tpu.train_model import run_training

    cfg = tiny_dataset_cfg
    model_path = os.path.join(cfg.models_dir, cfg.model_name(".npz"))
    if not os.path.exists(model_path):
        run_training(replace(cfg, train_model=True))
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 90, (18, cfg.roi_dim, cfg.roi_dim)).astype(np.float64)
    events = synthesize_events(
        frames, cfg.timebin / 1000.0, 2500, roi_origin=cfg.roi_origin, seed=2
    )
    stream = str(tmp_path / "stream.npy")
    np.save(stream, events)

    outputs = {}
    for chunk in (1, 5):
        out_base = str(tmp_path / f"out_c{chunk}")
        m = run_event_driven(
            replace(
                cfg,
                event_driven=True,
                headless=True,
                event_file=stream,
                stream_chunk_bins=chunk,
                output_base=out_base,
            )
        )
        newest = _newest_run_dir(out_base)
        outputs[chunk] = (np.load(os.path.join(newest, "spike_data.npy")), m.matches)
    spikes1, matches1 = outputs[1]
    spikes5, matches5 = outputs[5]
    assert spikes1.shape[0] > 5  # multiple chunks incl. a partial one
    np.testing.assert_array_equal(spikes5, spikes1)
    assert matches5 == matches1


def test_recorded_gap_guard_truncates_corrupt_timestamp(tiny_dataset_cfg, tmp_path):
    """One malformed far-future timestamp in a recorded stream (e.g.
    microseconds parsed as seconds) must not materialize billions of empty
    bins — the replay truncates at the jump, mirroring the live ingest's
    max_gap_bins rule."""
    from dataclasses import replace

    from lens_tpu.runtime.stream import aer_bin_source, substeps_for
    from lens_tpu.tools.make_event_stream import synthesize_events

    cfg = tiny_dataset_cfg
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 90, (4, cfg.roi_dim, cfg.roi_dim)).astype(np.float64)
    events = synthesize_events(
        frames, cfg.timebin / 1000.0, 1500, roi_origin=cfg.roi_origin, seed=1
    )
    corrupt = np.concatenate(
        [events, [[events[-1, 0] * 1e9, cfg.roi_x + 1, cfg.roi_y + 1, 1]]]
    )
    clean_path = str(tmp_path / "clean.npy")
    bad_path = str(tmp_path / "bad.npy")
    np.save(clean_path, events)
    np.save(bad_path, corrupt)
    steps = substeps_for(cfg.timebin)
    clean = list(aer_bin_source(replace(cfg, event_file=clean_path), steps))
    bad = list(aer_bin_source(replace(cfg, event_file=bad_path), steps))
    assert len(bad) == len(clean)  # corrupt tail dropped, no bin explosion
    for (r1, f1), (r2, f2) in zip(clean, bad):
        np.testing.assert_array_equal(r1, r2)
        np.testing.assert_array_equal(f1, f2)


def test_stream_dot_bound_affine_matches_static_check(qparams):
    """The static config check and the per-bin runtime guard share one
    affine bound a*cap + b; the check must flip exactly at its root."""
    from lens_tpu.runtime.stream import (
        check_stream_dot_range,
        stream_dot_bound_coeffs,
    )

    a, b = stream_dot_bound_coeffs(qparams)
    assert a > 0 and b >= 0
    cap_limit = int((2**31 - b) / a)
    check_stream_dot_range(qparams, 100, cap_limit - 1)  # below: passes
    with pytest.raises(ValueError, match="int32"):
        check_stream_dot_range(qparams, 100, cap_limit + 1)


def test_hot_filter_disabled_stream_runs_with_runtime_guard(
    tiny_dataset_cfg, tmp_path
):
    """--hot_pixel_rate 0 disables the static overflow premise; the stream
    must still run (per-bin runtime guard) and produce the same spikes as
    the capped run when the cap never binds."""
    from dataclasses import replace

    from lens_tpu.runtime.stream import run_event_driven
    from lens_tpu.tools.make_event_stream import synthesize_events
    from lens_tpu.train_model import run_training

    cfg = tiny_dataset_cfg
    model_path = os.path.join(cfg.models_dir, cfg.model_name(".npz"))
    if not os.path.exists(model_path):
        run_training(replace(cfg, train_model=True))
    rng = np.random.default_rng(8)
    frames = rng.integers(0, 60, (6, cfg.roi_dim, cfg.roi_dim)).astype(np.float64)
    events = synthesize_events(
        frames, cfg.timebin / 1000.0, 800, roi_origin=cfg.roi_origin, seed=4
    )
    stream = str(tmp_path / "s.npy")
    np.save(stream, events)
    out_base = str(tmp_path / "out_nocap")
    m = run_event_driven(
        replace(
            cfg,
            event_driven=True,
            headless=True,
            event_file=stream,
            hot_pixel_rate=0,
            output_base=out_base,
        )
    )
    assert m is not None
    newest = _newest_run_dir(out_base)
    assert np.load(os.path.join(newest, "spike_data.npy")).shape[0] >= 6


def test_consumer_crash_mid_drain_no_duplicate_rows(
    tiny_dataset_cfg, monkeypatch, tmp_path
):
    """An exception inside a bin consumer (matcher/dashboard) during a
    chunked drain must not duplicate that bin's spike row when the crash
    path re-drains the chunk — artifacts are at-most-once per bin."""
    from dataclasses import replace

    import lens_tpu.runtime.stream as sm
    from lens_tpu.train_model import run_training

    cfg = replace(
        tiny_dataset_cfg,
        event_driven=True,
        headless=True,
        stream_chunk_bins=3,
        output_base=str(tmp_path / "out"),
    )
    model_path = os.path.join(cfg.models_dir, cfg.model_name(".npz"))
    if not os.path.exists(model_path):
        run_training(replace(cfg, train_model=True, event_driven=False))

    real_push = sm.OnlineMatcher.push
    calls = {"n": 0}

    def dying_push(self, counts):
        calls["n"] += 1
        if calls["n"] == 4:
            raise RuntimeError("simulated matcher failure at bin 4")
        return real_push(self, counts)

    monkeypatch.setattr(sm.OnlineMatcher, "push", dying_push)
    with pytest.raises(RuntimeError):
        sm.run_event_driven(cfg)

    out_dir = sorted((tmp_path / "out").iterdir())[-1]
    spikes = np.load(out_dir / "spike_data.npy")
    # Chunks of 3 over 8 replay bins: chunk 1 (bins 0-2) drained fully,
    # chunk 2's bin 3 appended once (its push raised AFTER the append; the
    # re-drain skips it), bins 4-5 recovered by the crash-path re-drain.
    assert spikes.shape[0] == 6, spikes.shape
    assert calls["n"] == 6


def test_power_trace_is_replay_speed_independent(tiny_dataset_cfg, tmp_path):
    """power_data.npy models the CHIP processing the stream in real time,
    so two replays of the same recording — per-bin and chunked (different
    host speeds) — must produce byte-identical traces."""
    from dataclasses import replace

    from lens_tpu.runtime.stream import run_event_driven
    from lens_tpu.train_model import run_training

    cfg = tiny_dataset_cfg
    model_path = os.path.join(cfg.models_dir, cfg.model_name(".npz"))
    if not os.path.exists(model_path):
        run_training(replace(cfg, train_model=True))

    traces = {}
    for chunk in (1, 4):
        out_base = str(tmp_path / f"p{chunk}")
        run_event_driven(
            replace(
                cfg,
                event_driven=True,
                headless=True,
                stream_chunk_bins=chunk,
                output_base=out_base,
            )
        )
        newest = _newest_run_dir(out_base)
        traces[chunk] = np.load(
            os.path.join(newest, "power_data.npy"), allow_pickle=True
        )
    for tr1, tr4 in zip(traces[1], traces[4]):
        np.testing.assert_array_equal(np.asarray(tr1), np.asarray(tr4))


def test_recorded_gap_guard_keeps_largest_segment(tiny_dataset_cfg, tmp_path):
    """A corrupt far-PAST first line (near-zero garbage timestamp) must not
    reduce the replay to that single event — the guard keeps the largest
    sane segment and re-anchors the bin grid to it."""
    from dataclasses import replace

    from lens_tpu.runtime.stream import aer_bin_source, substeps_for
    from lens_tpu.tools.make_event_stream import synthesize_events

    cfg = tiny_dataset_cfg
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 90, (4, cfg.roi_dim, cfg.roi_dim)).astype(np.float64)
    events = synthesize_events(
        frames, cfg.timebin / 1000.0, 1200, roi_origin=cfg.roi_origin, seed=2
    )
    # Recording starts more than max_gap_bins after the corrupt t=0.001
    # line, so the prefix-vs-recording jump is oversized.
    events[:, 0] += 1_100_000 * cfg.timebin / 1000.0
    corrupt = np.concatenate(
        [[[0.001, cfg.roi_x + 1, cfg.roi_y + 1, 1]], events]
    )
    clean_path, bad_path = str(tmp_path / "c.npy"), str(tmp_path / "b.npy")
    np.save(clean_path, events)
    np.save(bad_path, corrupt)
    steps = substeps_for(cfg.timebin)
    clean = list(aer_bin_source(replace(cfg, event_file=clean_path), steps))
    bad = list(aer_bin_source(replace(cfg, event_file=bad_path), steps))
    assert len(bad) == len(clean) > 0
    for (r1, f1), (r2, f2) in zip(clean, bad):
        np.testing.assert_array_equal(r1, r2)
        np.testing.assert_array_equal(f1, f2)


def test_live_adaptive_chunking_soak(tiny_dataset_cfg, tmp_path, monkeypatch):
    """VERDICT r4 ask #4: bursty stdin arriving faster than real time must
    come out of the live ring as backlog GROUPS and be dispatched through
    the chunked catch-up program, with artifacts bit-identical to the
    forced per-bin live loop on the same feed (the chunked program itself
    is already proven bit-identical; this pins the adaptive grouping)."""
    import io
    import json
    import sys
    from dataclasses import replace

    import lens_tpu.runtime.stream as stream_mod
    from lens_tpu.runtime.stream import run_event_driven
    from lens_tpu.tools.make_event_stream import synthesize_events
    from lens_tpu.train_model import run_training

    cfg = tiny_dataset_cfg
    model_path = os.path.join(cfg.models_dir, cfg.model_name(".npz"))
    if not os.path.exists(model_path):
        run_training(replace(cfg, train_model=True))
    rng = np.random.default_rng(9)
    frames = rng.integers(0, 90, (24, cfg.roi_dim, cfg.roi_dim)).astype(
        np.float64
    )
    events = synthesize_events(
        frames, cfg.timebin / 1000.0, 1000, roi_origin=cfg.roi_origin, seed=4
    )
    lines = "".join(
        f"{t:.6f} {int(x)} {int(y)} {int(p)}\n" for t, x, y, p in events
    )

    def live_run(out_name):
        out_base = str(tmp_path / out_name)
        monkeypatch.setattr(sys, "stdin", io.StringIO(lines))
        run_event_driven(
            replace(
                cfg,
                event_driven=True,
                headless=True,
                event_file="-",
                output_base=out_base,
            )
        )
        newest = _newest_run_dir(out_base)
        spikes = np.load(os.path.join(newest, "spike_data.npy"))
        with open(os.path.join(newest, "metrics.json")) as f:
            metrics = json.load(f)
        return spikes, metrics

    spikes_adaptive, m_adaptive = live_run("live_adaptive")
    # A 4096-line feed spans ~4 bins at 1000 events/bin and 20 ms bins, so
    # completed bins queue in the ring and must surface as multi-bin
    # catch-up dispatches.
    assert m_adaptive["live_multi_dispatches"] > 0
    assert m_adaptive["live_dispatch_max_bins"] >= 2

    monkeypatch.setattr(stream_mod, "LIVE_CHUNK_MAX", 1)
    spikes_per_bin, m_per_bin = live_run("live_per_bin")
    assert m_per_bin["live_dispatch_max_bins"] == 1
    np.testing.assert_array_equal(spikes_adaptive, spikes_per_bin)
    assert m_adaptive["bins_processed"] == m_per_bin["bins_processed"] > 0
