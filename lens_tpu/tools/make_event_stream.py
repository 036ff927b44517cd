"""Synthesize a DVS event stream from a frame traverse.

Turns a folder of intensity frames (e.g. the bundled example traverse) into a
timestamped AER event stream at a configurable event rate — the missing link
for exercising `--event_driven` / `--collect_data` at realistic on-chip
densities (the reference hardware sees ~1e5 events/s; PNG replays carry far
fewer).  Each frame occupies one `timebin`; within the bin, events are drawn
per pixel with probability proportional to intensity (Poisson thinning with
uniformly distributed timestamps), placed in SENSOR coordinates so the
standard ROI crop (origin (23,0), run_speck.py:268-271) recovers the frame.

    python -m lens_tpu.tools.make_event_stream \
        --frames lens/dataset/example/davis128/example-query \
        --out /tmp/example_stream.npy --events_per_bin 50000
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image


def synthesize_events(
    frames: np.ndarray,  # (F, H, W) intensity/count frames
    timebin_s: float,
    events_per_bin: int,
    roi_origin=(23, 0),
    seed: int = 0,
) -> np.ndarray:
    """(N, 4) array of (t, x, y, pol) rows, t sorted ascending."""
    rng = np.random.default_rng(seed)
    f, h, w = frames.shape
    probs = frames.reshape(f, -1).astype(np.float64)
    rows = []
    for i in range(f):
        p = probs[i]
        total = p.sum()
        if total <= 0:
            continue
        p = p / total
        idx = rng.choice(h * w, size=events_per_bin, p=p)
        yy, xx = np.divmod(idx, w)
        t = rng.uniform(i * timebin_s, (i + 1) * timebin_s, events_per_bin)
        pol = rng.integers(0, 2, events_per_bin)
        rows.append(
            np.stack(
                [t, xx + roi_origin[0], yy + roi_origin[1], pol], axis=1
            )
        )
    events = np.concatenate(rows) if rows else np.zeros((0, 4))
    return events[np.argsort(events[:, 0], kind="stable")]


def load_frames_folder(
    folder: str, skip: int = 1, max_samples: int = 0
) -> np.ndarray:
    """Frames in NATURAL order (image_2 before image_10 — sad._natural_key,
    the ordering every other pipeline uses; a lexical sort would synthesize
    a frame-permuted stream that silently collapses recall against GT),
    with the dataset loader's skip/max_samples selection so a synthesized
    stream covers the same traverse subset as the offline pipelines
    (--filter / query_places)."""
    from lens_tpu.sad import _natural_key

    names = sorted(
        (f for f in os.listdir(folder) if f.endswith(".png")),
        key=_natural_key,
    )[:: max(skip, 1)]
    if max_samples:
        names = names[:max_samples]
    return np.stack(
        [np.asarray(Image.open(os.path.join(folder, n)).convert("L")) for n in names]
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Synthesize a DVS stream from frames")
    p.add_argument("--frames", required=True, help="folder of PNG frames")
    p.add_argument("--out", required=True, help=".npy output (t x y pol rows)")
    p.add_argument("--timebin", type=float, default=250.0, help="bin length, ms")
    p.add_argument("--events_per_bin", type=int, default=50_000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--filter", type=int, default=1,
        help="take every Nth frame (the dataset loader's skip)"
    )
    p.add_argument(
        "--max_frames", type=int, default=0,
        help="cap the traverse length (the dataset loader's max_samples)"
    )
    args = p.parse_args(argv)

    frames = load_frames_folder(args.frames, args.filter, args.max_frames)
    events = synthesize_events(
        frames, args.timebin / 1000.0, args.events_per_bin, seed=args.seed
    )
    np.save(args.out, events)
    print(f"wrote {len(events):,} events over {len(frames)} bins to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
