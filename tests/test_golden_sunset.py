"""Golden end-to-end test for the SECOND bundled model family: the
Brisbane-Event (davis346) sunset traverses with the converted sunset2
checkpoint (reference models/sunset2_LENS_IN49_FN63_DB641.pth; the paper's
cross-traverse evaluation config: dims=7, roi=49, timebin=1000, seq=4,
GT tolerance 2).  Pins the full pipeline — 724 queries x 641 places,
including the k=1 center-pixel torch-wraparound quirk this geometry
triggers (dataset.py kernel_size=7) — not just the example set."""

import os

import pytest

from lens_tpu.config import LensConfig
from lens_tpu.run_model import run_inference

GOLDEN_RECALL = [0.22, 0.52, 0.65, 0.73, 0.78, 0.8]


@pytest.fixture(scope="module")
def sunset_cfg(tmp_path_factory):
    root = os.path.join(os.path.dirname(__file__), "..")
    return LensConfig(
        dataset="brisevent",
        camera="davis346",
        reference="sunset2",
        query="sunset1",
        reference_places=641,
        query_places=724,
        sequence_length=4,
        GT_tolerance=2,
        timebin=1000,
        dims=7,
        roi_dim=49,
        feature_multiplier=63 / 49,
        matching=True,
        data_dir=os.path.join(root, "lens", "dataset") + os.sep,
        models_dir=os.path.join(root, "lens", "models"),
        output_base=str(tmp_path_factory.mktemp("sunset_out")),
    )


def test_sunset_family_golden_recall(sunset_cfg):
    res = run_inference(sunset_cfg)
    assert res.counts.shape == (724, 641)
    assert res.recall_at_n == GOLDEN_RECALL
