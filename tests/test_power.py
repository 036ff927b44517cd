import numpy as np

from lens_tpu.runtime.power import RAILS, PowerModel, PowerMonitor, count_synops


def test_rail_powers_scale_with_activity():
    m = PowerModel()
    low = m.rail_powers(1e3, 1e5)
    high = m.rail_powers(1e6, 1e8)
    assert high["logic"] > low["logic"]
    assert high["io"] > low["io"]
    assert high["vddd"] == low["vddd"]  # static rail


def test_reference_workload_lands_near_published_mean():
    """~1 query/s with ~1e5 events/s and ~2.4e6 synops/s should land in the
    few-mW band of the published Speck measurement (BASELINE.md ~2.67 mW)."""
    m = PowerModel()
    p = m.rail_powers(events_per_s=1e5, synops_per_s=2.4e6)
    total_mw = sum(p.values()) * 1e3
    assert 0.5 < total_mw < 10.0


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
