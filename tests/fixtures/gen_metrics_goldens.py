"""Generate golden fixtures by EXECUTING the reference metrics implementation.

The reference vendors GPL-licensed metric code (reference
lens/src/metrics.py:1-16); our implementations are clean-room
(lens_tpu/metrics/vpr.py).  To pin exact numerical parity without copying any
GPL text, this script runs the reference module itself on seeded random
inputs and records its outputs as .npz fixtures that the test suite asserts
against.  Inputs deliberately include integer-valued (tied) similarity
matrices, because spike-count similarity matrices are full of ties and
tie-ordering is where clean-room reimplementations usually drift.

Run (requires the reference checkout; fixtures are committed so tests do not):
    python tests/fixtures/gen_metrics_goldens.py /root/reference
"""

import importlib.util
import sys
import tempfile

import numpy as np

import matplotlib

matplotlib.use("Agg")


def load_reference_metrics(ref_root: str):
    spec = importlib.util.spec_from_file_location(
        "ref_metrics", f"{ref_root}/lens/src/metrics.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def make_inputs(rng, n_db, n_q, integer=False, p_gt=0.08):
    if integer:
        S = rng.integers(0, 12, (n_db, n_q)).astype(np.float64)
    else:
        S = rng.normal(0, 1, (n_db, n_q))
    GT = (rng.random((n_db, n_q)) < p_gt).astype(np.uint8)
    # ensure at least one GT-positive column (both impls special-case none)
    GT[rng.integers(0, n_db), 0] = 1
    # GTsoft = GT dilated down the db axis (a plausible tolerance band)
    GTsoft = GT.copy()
    GTsoft[1:] |= GT[:-1]
    GTsoft[:-1] |= GT[1:]
    return S, GT, GTsoft


def main(ref_root: str, out_path: str):
    ref = load_reference_metrics(ref_root)
    rng = np.random.default_rng(42)
    store = {}
    cases = []
    for ci, (shape, integer) in enumerate(
        [((50, 60), False), ((40, 40), True), ((128, 30), True), ((25, 90), False)]
    ):
        S, GT, GTsoft = make_inputs(rng, *shape, integer=integer)
        store[f"S_{ci}"] = S
        store[f"GT_{ci}"] = GT
        store[f"GTsoft_{ci}"] = GTsoft
        for matching in ("single", "multi"):
            for soft in (False, True):
                gts = GTsoft if soft else None
                with tempfile.TemporaryDirectory() as td:
                    P, R = ref.createPR(
                        S, GT, td, GTsoft=gts, matching=matching, n_thresh=100
                    )
                key = f"pr_{ci}_{matching}_{'soft' if soft else 'hard'}"
                store[key + "_P"] = np.asarray(P, np.float64)
                store[key + "_R"] = np.asarray(R, np.float64)
        for K in (1, 3, 5, 10):
            for soft in (False, True):
                gts = GTsoft if soft else None
                key = f"ratk_{ci}_{K}_{'soft' if soft else 'hard'}"
                store[key] = np.float64(ref.recallAtK(S, GT, GTsoft=gts, K=K))
        # recallAt100precision: only matching='multi' executes in the
        # reference — with matching='single' it crashes because it passes
        # GTsoft positionally into createPR's outputdir parameter
        # (metrics.py:166), which the single-match plotting branch then uses
        # as a path.  The same positional bug means a GTsoft argument is
        # silently IGNORED (it never reaches createPR's GTsoft parameter), so
        # only the hard-GT variant is a meaningful golden.
        store[f"r100_{ci}"] = np.float64(
            ref.recallAt100precision(S, GT, matching="multi", n_thresh=100)
        )
        cases.append(ci)
    store["n_cases"] = np.int64(len(cases))
    np.savez_compressed(out_path, **store)
    print(f"wrote {out_path}: {len(store)} arrays, {len(cases)} cases")


if __name__ == "__main__":
    ref_root = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
    out = sys.argv[2] if len(sys.argv) > 2 else "tests/fixtures/metrics_goldens.npz"
    main(ref_root, out)
