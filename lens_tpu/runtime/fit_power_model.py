"""Fit the PowerModel constants from the published Speck power trace.

The activity-based power model (runtime/power.py) used to carry hand-asserted
pJ/op constants "calibrated so the reference workload lands near the
published ~2.67 mW".  This script DERIVES them reproducibly from the shipped
reference measurement (reference lens/data/Figure2/SPECK_LENS_inference.npy,
bundled here at lens/data/Figure2/ — 5 rails x 2444 (timestamp_us, watts)
samples recorded by run_speck.py:301-307,345-354 during on-chip inference):

  - one anchored constant: e_synop_j = 10 pJ/SOP, the advertised energy class
    of the chip's digital asynchronous CNN cores (single-digit-pJ/SOP
    hardware; this is the only assumed number);
  - the chip's synop rate during the recorded run then falls out of the
    logic rail:      synops/s = mean(logic W) / e_synop_j  (~1.3e8);
  - the SRAM fetch energy from the ram rail at that same rate:
                     e_sram_j = mean(ram W) / synops_per_s;
  - the AER input energy from the io rail at the reference DVS event rate
    (~1e5 events/s, the stream density of the run_speck deployment logs):
                     e_event_j = mean(io W) / events_per_s;
  - the static floors directly from the vddd/vdda rail means.

PowerModel's defaults ARE this fit (tests/test_power.py pins them); re-run
after changing the trace or the anchors:

    python -m lens_tpu.runtime.fit_power_model [--trace PATH]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from lens_tpu.runtime.power import RAILS, PowerModel

DEFAULT_TRACE = os.path.join(
    os.path.dirname(__file__), "..", "..", "lens", "data", "Figure2",
    "SPECK_LENS_inference.npy",
)
ANCHOR_E_SYNOP_J = 10e-12  # digital async CNN core energy class, pJ/SOP
REFERENCE_EVENTS_PER_S = 1e5  # DVS stream density of the run_speck deployment


def rail_means_w(trace: np.ndarray) -> dict:
    """Mean watts per rail from a (5, n, 2) (timestamp, watts) trace."""
    if trace.shape[0] != len(RAILS) or trace.shape[-1] != 2:
        raise ValueError(f"expected (5, n, 2) rail trace, got {trace.shape}")
    return {rail: float(trace[i][:, 1].mean()) for i, rail in enumerate(RAILS)}


def fit_from_trace(
    trace: np.ndarray,
    e_synop_j: float = ANCHOR_E_SYNOP_J,
    events_per_s: float = REFERENCE_EVENTS_PER_S,
) -> PowerModel:
    """Derive a PowerModel from a measured rail trace (see module docstring)."""
    means = rail_means_w(trace)
    synops_per_s = means["logic"] / e_synop_j
    return PowerModel(
        e_synop_j=e_synop_j,
        e_sram_j=means["ram"] / synops_per_s,
        e_event_j=means["io"] / events_per_s,
        p_static_vddd_w=means["vddd"],
        p_static_vdda_w=means["vdda"],
    )


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--trace", default=DEFAULT_TRACE)
    parser.add_argument("--e_synop_pj", type=float, default=ANCHOR_E_SYNOP_J * 1e12)
    parser.add_argument("--events_per_s", type=float, default=REFERENCE_EVENTS_PER_S)
    args = parser.parse_args(argv)

    trace = np.load(args.trace, allow_pickle=True)
    fitted = fit_from_trace(trace, args.e_synop_pj * 1e-12, args.events_per_s)
    defaults = PowerModel()
    means = rail_means_w(trace)
    synops = means["logic"] / (args.e_synop_pj * 1e-12)

    print(f"trace: {args.trace}")
    print(f"rail means (mW): " + ", ".join(f"{k}={v*1e3:.4f}" for k, v in means.items()))
    print(f"implied synops/s at {args.e_synop_pj:.1f} pJ/SOP: {synops:.4g}")
    print(f"{'constant':18s} {'fitted':>12s} {'default':>12s} {'delta':>8s}")
    for name in (
        "e_synop_j", "e_sram_j", "e_event_j", "p_static_vddd_w", "p_static_vdda_w"
    ):
        f = getattr(fitted, name)
        d = getattr(defaults, name)
        delta = (f - d) / d if d else float("inf")
        print(f"{name:18s} {f:12.5g} {d:12.5g} {delta:+8.2%}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
