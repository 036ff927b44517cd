"""End-to-end LENS-TPU workflow on a synthetic event-camera deployment.

Walks the entire user journey with no hardware and no bundled data:

  1. synthesize a DVS event stream for a "reference" traverse and a noisy
     revisit ("query" traverse)
  2. --collect_data: accumulate both streams into PNG frame datasets + CSVs
  3. --train_model: STDP-train a network on the reference traverse
  4. inference: evaluate query vs reference, Recall@N against ground truth
  5. --event_driven: replay the query stream through the quantized
     streaming pipeline

Run:  python examples/full_workflow.py [--places 16] [--workdir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
from dataclasses import replace

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lens_tpu.config import LensConfig  # noqa: E402
from lens_tpu.tools.make_event_stream import synthesize_events  # noqa: E402


def make_world(n_places: int, roi: int, rng: np.random.Generator) -> np.ndarray:
    """Distinct 'scenes': blobs + structure per place."""
    frames = (rng.random((n_places, roi, roi)) * 60).astype(np.float64)
    for i in range(n_places):
        r = (i * 3) % (roi - 4)
        frames[i, r : r + 3, :] += 160
        frames[i, :, (i * 5) % (roi - 2)] += 120
    return np.clip(frames, 0, 255)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--places", type=int, default=16)
    p.add_argument("--roi", type=int, default=16)
    p.add_argument("--dims", type=int, default=4)
    p.add_argument("--timebin", type=int, default=50)
    p.add_argument("--events_per_bin", type=int, default=20_000)
    p.add_argument("--workdir", default="/tmp/lens_tpu_workflow")
    args = p.parse_args(argv)

    os.makedirs(args.workdir, exist_ok=True)
    rng = np.random.default_rng(0)
    world = make_world(args.places, args.roi, rng)

    # 1. Synthesize streams (query = same world, photometric jitter).
    tb_s = args.timebin / 1000.0
    ref_events = synthesize_events(world, tb_s, args.events_per_bin,
                                   roi_origin=(23, 0), seed=1)
    qry_world = np.clip(world * rng.uniform(0.85, 1.15, world.shape), 0, 255)
    qry_events = synthesize_events(qry_world, tb_s, args.events_per_bin,
                                   roi_origin=(23, 0), seed=2)
    ref_path = os.path.join(args.workdir, "ref_events.npy")
    qry_path = os.path.join(args.workdir, "qry_events.npy")
    np.save(ref_path, ref_events)
    np.save(qry_path, qry_events)
    print(f"[1/5] synthesized {len(ref_events):,} + {len(qry_events):,} events")

    data_dir = os.path.join(args.workdir, "dataset") + os.sep
    base = LensConfig(
        dataset="synth",
        camera="dvs",
        reference="ref-trav",
        query="qry-trav",
        data_dir=data_dir,
        reference_places=args.places,
        query_places=args.places,
        dims=args.dims,
        roi_dim=args.roi,
        timebin=args.timebin,
        sequence_length=2,
        GT_tolerance=1,
        epoch_feat=32,
        epoch_out=32,
        matching=True,
        raster_mode="jax",
        models_dir=os.path.join(args.workdir, "models"),
        output_base=os.path.join(args.workdir, "output"),
    )

    # 2. Collect both traverses from the streams.
    from lens_tpu.runtime.collect import run_collector

    os.makedirs(os.path.join(data_dir, "synth", "dvs"), exist_ok=True)
    for name, path in (("ref-trav", ref_path), ("qry-trav", qry_path)):
        run_collector(replace(base, collect_data=True, event_file=path,
                              data_name=name))
        os.replace(os.path.join(data_dir, f"{name}.csv"),
                   os.path.join(data_dir, f"{name}.csv"))
    print("[2/5] collected frame datasets")
    np.save(
        os.path.join(data_dir, "synth", "dvs", "ref-trav_qry-trav_GT.npy"),
        np.eye(args.places, dtype=int),
    )

    # 3. Train.
    from lens_tpu.train_model import run_training

    model_path = run_training(replace(base, train_model=True))
    print(f"[3/5] trained model at {model_path}")

    # 4. Evaluate.
    from lens_tpu.run_model import run_inference

    res = run_inference(replace(base, sim_mat=True))
    print(f"[4/5] Recall@N = {res.recall_at_n}")

    # 5. Stream the query events online.
    from lens_tpu.runtime.stream import run_event_driven

    matcher = run_event_driven(replace(base, event_driven=True,
                                       event_file=qry_path))
    print(f"[5/5] streaming done; {len(matcher.matches)} online matches logged")
    print(f"artifacts under {base.output_base}")
    return 0


if __name__ == "__main__":
    from lens_tpu.utils.jaxsetup import setup_jax

    setup_jax()
    raise SystemExit(main())
