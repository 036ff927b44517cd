"""AER-sparse batch evaluation — dense-frame-free VPR from packed events.

The deployment-shaped evaluation path (BENCHMARKS.md `aer` section): a
recorded DVS stream is LUT-filtered per event at ingest (the native
engine's job — only ~1-2% of sensor events hit the center-pixel grid),
shipped to the device as packed uint32 words, scatter-expanded and
evaluated by the quantized even-spread forward in ONE device program, and
scored against ground truth.  No dense frame ever crosses the host-device
link.

    python examples/aer_batch_eval.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from lens_tpu.core.network import SpikeThresholds
from lens_tpu.data.dataset import FrameDataset
from lens_tpu.metrics.gt import make_gt_tolerant
from lens_tpu.metrics.vpr import recall_at_k
from lens_tpu.ops.events_device import aer_counts_forward, pack_center_events
from lens_tpu.ops.seqmatch import sequence_conv
from lens_tpu.runtime.speck_sim import (
    discretize,
    quantized_recips_for_counts,
)
from lens_tpu.runtime.stream import center_pixel_lut
from lens_tpu.tools.make_event_stream import synthesize_events
from lens_tpu.utils import checkpoint
from lens_tpu.utils.table import ascii_table

ROOT = os.path.join(os.path.dirname(__file__), "..")
EVENTS_PER_BIN = 20_000
TIMEBIN_MS = 250


def main() -> int:
    # 1. A recorded stream of the query traverse at on-chip density.
    ds = FrameDataset.load(
        os.path.join(ROOT, "lens/dataset/example-query.csv"),
        os.path.join(ROOT, "lens/dataset/example/davis128/example-query"),
        max_samples=100,
    )
    events = synthesize_events(
        ds.frames.astype(np.float64), TIMEBIN_MS / 1000.0, EVENTS_PER_BIN,
        roi_origin=(23, 0), seed=0,
    )
    n_bins = len(ds)

    # 2. Ingest-stage LUT filter (per event): sensor coords -> input index.
    lut = center_pixel_lut(80, 10)
    xs = events[:, 1].astype(np.int64) - 23
    ys = events[:, 2].astype(np.int64)
    keep = (xs >= 0) & (xs < 80) & (ys >= 0) & (ys < 80)
    pix = lut[ys[keep], xs[keep]]
    t_keep = events[keep, 0]
    hit = pix >= 0
    bin_idx = np.floor(t_keep[hit] / (TIMEBIN_MS / 1000.0)).astype(np.int64)
    words = pack_center_events(bin_idx, pix[hit], 100)
    kept_pct = 100.0 * words.size / len(events)
    print(
        f"{len(events):,} sensor events -> {words.size:,} packed words "
        f"({kept_pct:.1f}% hit the center grid; "
        f"{words.size * 4 / 1e3:.0f} KB h2d vs {n_bins * 6400 / 1e3:.0f} KB dense)"
    )

    # 3. One device program: scatter-expand + quantized forward (verified
    # reciprocals when the count envelope admits them).
    params = checkpoint.load_model(
        os.path.join(ROOT, "lens/models"),
        "example-reference_LENS_IN100_FN200_DB100.pth",
    )
    qp = discretize(params, SpikeThresholds(), -1.0)
    pix_bin_max = int(np.bincount(words.astype(np.int64)).max(initial=1))
    recips = quantized_recips_for_counts(qp, -(-pix_bin_max // TIMEBIN_MS))
    t0 = time.perf_counter()
    counts = np.asarray(
        aer_counts_forward(
            qp, jnp.asarray(words), n_bins, 100, TIMEBIN_MS, recips=recips
        )
    )
    dt = time.perf_counter() - t0
    print(f"forward: {n_bins} bins in {dt*1e3:.0f} ms (incl. compile on first run)")

    # 4. Standard scoring: sequence conv -> Recall@N vs ground truth.
    GT = np.load(
        os.path.join(
            ROOT,
            "lens/dataset/example/davis128/example-reference_example-query_GT.npy",
        )
    )
    S = np.asarray(sequence_conv(counts.astype(np.float64), 2))
    GTtol = make_gt_tolerant(GT, 2, 3)
    ns = [1, 5, 10, 15, 20, 25]
    recalls = [round(recall_at_k(S, GTtol, K=n), 2) for n in ns]
    print(ascii_table(["N", *map(str, ns)], [["Recall", *recalls]]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
