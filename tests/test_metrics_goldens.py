"""Exact-parity goldens: clean-room metrics vs the EXECUTED reference.

Fixtures in tests/fixtures/metrics_goldens.npz were produced by running the
reference's GPL metrics module (reference lens/src/metrics.py) on seeded
random inputs — including integer-valued (heavily tied) similarity matrices,
where tie-ordering drift would show — via tests/fixtures/gen_metrics_goldens.py.
No GPL text was copied; only outputs were recorded.

Documented reference bugs these goldens work around:
  - createPR divides by zero when a threshold admits no predictions
    (metrics.py:86); unreachable on finite random inputs, so parity holds.
  - recallAt100precision passes GTsoft positionally into createPR's
    `outputdir` parameter (metrics.py:166): matching='single' crashes, and a
    GTsoft argument is silently ignored.  Only the multi/hard variant is
    golden-tested; our implementation accepts GTsoft properly (a fix).
"""

import os

import numpy as np
import pytest

from lens_tpu.metrics.vpr import create_pr, recall_at_100_precision, recall_at_k

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "metrics_goldens.npz")


@pytest.fixture(scope="module")
def goldens():
    return np.load(FIXTURE)


def _case(goldens, ci):
    return goldens[f"S_{ci}"], goldens[f"GT_{ci}"], goldens[f"GTsoft_{ci}"]


@pytest.mark.parametrize("ci", range(4))
@pytest.mark.parametrize("matching", ["single", "multi"])
@pytest.mark.parametrize("soft", [False, True])
def test_create_pr_matches_executed_reference(goldens, ci, matching, soft):
    S, GT, GTsoft = _case(goldens, ci)
    P, R, _ = create_pr(
        S, GT, GTsoft if soft else None, matching=matching, n_thresh=100
    )
    key = f"pr_{ci}_{matching}_{'soft' if soft else 'hard'}"
    np.testing.assert_allclose(np.asarray(P), goldens[key + "_P"], rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(R), goldens[key + "_R"], rtol=0, atol=0)


@pytest.mark.parametrize("ci", range(4))
@pytest.mark.parametrize("K", [1, 3, 5, 10])
@pytest.mark.parametrize("soft", [False, True])
def test_recall_at_k_matches_executed_reference(goldens, ci, K, soft):
    S, GT, GTsoft = _case(goldens, ci)
    ours = recall_at_k(S, GT, GTsoft if soft else None, K=K)
    key = f"ratk_{ci}_{K}_{'soft' if soft else 'hard'}"
    assert ours == float(goldens[key])


@pytest.mark.parametrize("ci", range(4))
def test_recall_at_100_precision_matches_executed_reference(goldens, ci):
    S, GT, _ = _case(goldens, ci)
    ours = recall_at_100_precision(S, GT, matching="multi", n_thresh=100)
    assert ours == float(goldens[f"r100_{ci}"])
