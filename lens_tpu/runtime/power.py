"""Software power/energy model replacing the Speck power monitor.

The reference samples five physical power rails (io/ram/logic/vddd/vdda) at
20 Hz through samna and stores them as `power_data.npy` (reference
run_speck.py:301-307, 345-354; BASELINE.md mean ~2.67 mW during inference).
A TPU host cannot measure a neuromorphic chip's rails, so this module provides
an explicit *activity-based energy model* producing the same artifact shape:
per-rail (timestamp, watts) traces sampled at 20 Hz.

Model (documented, first-party):
  - logic rail: E_synop * synops/s — synaptic operations dominate dynamic
    power; E_synop is anchored at 10 pJ (digital async CNN cores are
    single-digit-pJ/SOP class hardware — the one assumed constant).
  - ram  rail: E_sram * synops/s — weight fetch per synop.
  - io   rail: E_event * events/s — AER input bandwidth.
  - vddd/vdda: constant static floors.
The defaults are FITTED, not asserted: runtime/fit_power_model.py derives
them from the shipped reference measurement (lens/data/Figure2/
SPECK_LENS_inference.npy — rail means io 0.0590 / ram 0.6090 / logic 1.2811 /
vddd 0.0859 / vdda 0.6394 mW, total 2.674 mW) given the 10 pJ/SOP anchor and
the ~1e5 events/s stream density of the reference deployment; the implied
on-chip rate is ~1.3e8 synops/s.  tests/test_power.py pins defaults == fit.
These are still estimates, not measurements — consumers needing ground truth
must profile real hardware.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

RAILS = ["io", "ram", "logic", "vddd", "vdda"]


@dataclass
class PowerModel:
    # Fitted from the published trace by runtime/fit_power_model.py; only
    # e_synop_j is an anchor (hardware energy class), the rest are derived.
    e_synop_j: float = 10e-12  # J per synaptic operation (logic) — ANCHOR
    e_sram_j: float = 4.7541e-12  # J per synop weight fetch (ram) — fitted
    e_event_j: float = 590.03e-12  # J per input AER event (io) — fitted
    p_static_vddd_w: float = 0.085893e-3  # static rails — fitted means
    p_static_vdda_w: float = 0.63941e-3

    def rail_powers(self, events_per_s: float, synops_per_s: float) -> dict:
        return {
            "io": self.e_event_j * events_per_s,
            "ram": self.e_sram_j * synops_per_s,
            "logic": self.e_synop_j * synops_per_s,
            "vddd": self.p_static_vddd_w,
            "vdda": self.p_static_vdda_w,
        }


@dataclass
class PowerMonitor:
    """Accumulates activity and emits 20 Hz rail traces
    (artifact-compatible with run_speck.py:345-354)."""

    model: PowerModel = field(default_factory=PowerModel)
    sample_hz: float = 20.0
    _records: List[tuple] = field(default_factory=list)  # (t, events, synops, dt)
    _t0: float = field(default_factory=time.time)
    _traces_cache: Optional[tuple] = field(default=None, repr=False)

    def record_bin(
        self,
        n_events: float,
        n_synops: float,
        duration_s: float,
        t: float | None = None,
    ) -> None:
        """One collection interval's activity.  `t` is the bin's start on the
        STREAM clock (seconds); chip-simulating callers pass it (bin index x
        timebin) so the trace timeline and rates are replay-speed
        independent — the chip would process the stream in real time, so
        modeled power must not scale with how fast the host happens to
        replay it.  Default: host wall time since monitor creation."""
        if t is None:
            t = time.time() - self._t0
        self._records.append((t, n_events, n_synops, duration_s))

    def traces(self) -> List[np.ndarray]:
        """Five (n_samples, 2) float arrays of (timestamp, watts), 20 Hz.

        Rates are ENERGY-preserving per sample: each record's activity
        spreads over max(d, sample_period) — a bin shorter than the 50 ms
        sample period contributes ev/sample_period to its one covering
        sample, not ev/d (dividing by the true d while widening the mask
        overlapped short bins and inflated power by sample_period/d, e.g.
        ~5x at timebin 10 ms).  One vectorized pass, memoized per record
        count (shutdown calls save() and mean_total_mw() back-to-back; the
        old per-record-mask x per-sample-Python-loop took minutes on
        hour-scale streams).
        """
        if not self._records:
            return [np.zeros((0, 2)) for _ in RAILS]
        if self._traces_cache is not None and self._traces_cache[0] == len(
            self._records
        ):
            return self._traces_cache[1]
        period = 1.0 / self.sample_hz
        end = max(t + d for t, _, _, d in self._records)
        n_samples = int(np.floor((end + 1e-9) / period)) + 1
        ts = np.arange(n_samples) * period
        ev_rate = np.zeros(n_samples)
        syn_rate = np.zeros(n_samples)
        rec = np.asarray(self._records, np.float64)  # (R, 4): t, ev, syn, d
        t, ev, syn, d = rec[:, 0], rec[:, 1], rec[:, 2], rec[:, 3]
        d_eff = np.maximum(d, period)
        i0 = np.ceil((t - 1e-12) / period).astype(np.int64).clip(0, n_samples)
        i1 = np.ceil((t + d_eff - 1e-12) / period).astype(np.int64).clip(
            i0, n_samples
        )
        i1 = np.maximum(i1, i0 + 1).clip(0, n_samples)
        # Difference-array accumulation: add rate at i0, subtract at i1,
        # cumulative-sum — O(R + S) instead of O(R x S) masks.
        for rate_acc, amount in ((ev_rate, ev), (syn_rate, syn)):
            dif = np.zeros(n_samples + 1)
            np.add.at(dif, i0, amount / d_eff)
            np.add.at(dif, i1, -(amount / d_eff))
            rate_acc += np.cumsum(dif[:-1])
        rails = {
            "io": self.model.e_event_j * ev_rate,
            "ram": self.model.e_sram_j * syn_rate,
            "logic": self.model.e_synop_j * syn_rate,
            "vddd": np.full(n_samples, self.model.p_static_vddd_w),
            "vdda": np.full(n_samples, self.model.p_static_vdda_w),
        }
        out = [np.stack([ts, rails[rail]], axis=1) for rail in RAILS]
        self._traces_cache = (len(self._records), out)
        return out

    def save(self, path: str) -> None:
        np.save(path, np.array(self.traces(), dtype=object), allow_pickle=True)

    def mean_total_mw(self) -> float:
        traces = self.traces()
        return float(sum(tr[:, 1].mean() for tr in traces if len(tr)) * 1e3)


def count_synops(spikes_in_per_layer: List[float], fan_outs: List[int]) -> float:
    """Synaptic operations = sum over layers of input spikes x fan-out."""
    return float(sum(s * f for s, f in zip(spikes_in_per_layer, fan_outs)))
