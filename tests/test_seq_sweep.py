"""Matched-L characterization tooling (tools/seq_sweep.py) — CI pins.

SEQ_SWEEP.json is a committed result artifact (BENCHMARKS.md's matched-L
section quotes it); its SAD column is fully deterministic (PNG folders +
integer L1 + 'valid' conv), so CI regenerates it and requires an exact
match.  This also locks the refactored sad_L_grid (one shared L1 matrix,
inline run_sad-identical scoring, sad.py:68-83) to the numbers the slow
per-L run_sad path originally produced."""

import json
import os

import numpy as np
import pytest

from lens_tpu.tools.online_recall import gt_path_for, traverse_configs
from lens_tpu.tools.seq_sweep import OFFLINE_L_GRID, sad_L_grid

ROOT = os.path.join(os.path.dirname(__file__), "..")


@pytest.mark.parametrize("traverse", ["example", "sunset"])
def test_sad_L_grid_matches_committed_artifact(traverse, tmp_path):
    with open(os.path.join(ROOT, "SEQ_SWEEP.json")) as f:
        committed = {
            r["traverse"]: r["sad_by_L"] for r in json.load(f)["reports"]
        }
    off = traverse_configs(ROOT, str(tmp_path))[traverse]["offline"]
    GT = np.load(gt_path_for(off))

    got = sad_L_grid(off, GT)

    assert sorted(got) == sorted(str(L) for L in OFFLINE_L_GRID)
    assert got == committed[traverse]
    # The matched-L claims BENCHMARKS.md rests on: SAD's example AUC peaks
    # at L=1 and never exceeds 21.29; sunset climbs monotonically with L.
    if traverse == "example":
        assert max(v["auc"] for v in got.values()) == got["1"]["auc"] == 21.29
    else:
        aucs = [got[str(L)]["auc"] for L in OFFLINE_L_GRID]
        assert aucs == sorted(aucs) and aucs[-1] == 20.555
