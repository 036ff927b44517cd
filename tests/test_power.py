import numpy as np
import pytest

from lens_tpu.runtime.power import RAILS, PowerModel, PowerMonitor, count_synops


def test_rail_powers_scale_with_activity():
    m = PowerModel()
    low = m.rail_powers(1e3, 1e5)
    high = m.rail_powers(1e6, 1e8)
    assert high["logic"] > low["logic"]
    assert high["io"] > low["io"]
    assert high["vddd"] == low["vddd"]  # static rail


def test_reference_workload_reproduces_published_mean():
    """At the fitted operating point (1e5 events/s, the trace-implied
    ~1.28e8 synops/s) the model reproduces the published 2.674 mW total
    (BASELINE.md) — by construction of the fit, pinned here."""
    from lens_tpu.runtime.fit_power_model import ANCHOR_E_SYNOP_J

    m = PowerModel()
    synops_per_s = 1.2811e-3 / ANCHOR_E_SYNOP_J  # logic rail mean / anchor
    p = m.rail_powers(events_per_s=1e5, synops_per_s=synops_per_s)
    total_mw = sum(p.values()) * 1e3
    assert abs(total_mw - 2.674) < 0.01


def test_defaults_equal_trace_fit():
    """PowerModel's defaults ARE the reproducible fit from the bundled
    published trace (VERDICT r2 ask #7: derived, not asserted).  Re-running
    fit_power_model on lens/data/Figure2/SPECK_LENS_inference.npy must
    regenerate every default within rounding tolerance."""
    import os

    from lens_tpu.runtime.fit_power_model import DEFAULT_TRACE, fit_from_trace

    trace = np.load(os.path.abspath(DEFAULT_TRACE), allow_pickle=True)
    fitted = fit_from_trace(trace)
    defaults = PowerModel()
    for name in (
        "e_synop_j",
        "e_sram_j",
        "e_event_j",
        "p_static_vddd_w",
        "p_static_vdda_w",
    ):
        assert getattr(fitted, name) == pytest.approx(
            getattr(defaults, name), rel=1e-4
        ), name


def test_monitor_traces_shape_and_artifact(tmp_path):
    mon = PowerMonitor()
    mon.record_bin(n_events=1000, n_synops=50_000, duration_s=0.2)
    mon.record_bin(n_events=2000, n_synops=80_000, duration_s=0.2)
    traces = mon.traces()
    assert len(traces) == 5
    for tr in traces:
        assert tr.ndim == 2 and tr.shape[1] == 2
    path = tmp_path / "power_data.npy"
    mon.save(str(path))
    loaded = np.load(path, allow_pickle=True)
    assert len(loaded) == len(RAILS)
    assert mon.mean_total_mw() > 0


def test_count_synops():
    assert count_synops([10.0, 5.0], [100, 200]) == 10 * 100 + 5 * 200


def test_record_bin_stream_clock():
    """Chip-simulating callers pass the stream-time bin start; the trace
    timeline must follow it, independent of host wall time."""
    mon = PowerMonitor()
    mon.record_bin(1000, 50_000, 0.25, t=0.0)
    mon.record_bin(1000, 50_000, 0.25, t=0.25)
    traces = mon.traces()
    ts = traces[0][:, 0]
    assert ts[0] == 0.0 and ts[-1] <= 0.5 + 1e-6
