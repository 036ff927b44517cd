"""Offline DVS processing CLI (reference lens/tools/process_dvs.py:45-87).

    python -m lens_tpu.tools.process_dvs --tool extract   --dataset_folder D --input_file run.bag
    python -m lens_tpu.tools.process_dvs --tool simple_rep --dataset_folder D --input_file run --pixels 49
    python -m lens_tpu.tools.process_dvs --tool decay_rep  --dataset_folder D --input_file run
    python -m lens_tpu.tools.process_dvs --tool video      --dataset_folder D --input_file run
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from lens_tpu.runtime import events_native
from lens_tpu.tools import dvs


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Offline DVS event processing")
    p.add_argument("--tool", required=True,
                   choices=["extract", "simple_rep", "decay_rep", "video"])
    p.add_argument("--dataset_folder", required=True)
    p.add_argument("--input_file", required=True,
                   help="bag file (extract) or stream stem (reps/video)")
    p.add_argument("--output_name", default="")
    p.add_argument("--timebin", type=float, default=30.0, help="frames per second")
    p.add_argument("--pixels", type=int, default=49,
                   help="sampled pixel count for simple_rep (square number)")
    p.add_argument("--accum_factor", type=float, default=1.0)
    p.add_argument("--decay_factor", type=float, default=10.0)
    p.add_argument("--hot_pixels", default="", help="x,y exclusion list file stem")
    p.add_argument("--reference", action="store_true",
                   help="simple_rep: draw a new patch map (reference traverse); "
                        "otherwise load the stored one")
    p.add_argument("--patch_tag", default="reference",
                   help="tag of the stored patch map to create/reuse")
    p.add_argument("--frames_max", type=int, default=100_000)
    p.add_argument("--seed", type=int, default=0)
    return p


def _load_events(args):
    stem = os.path.join(args.dataset_folder, args.input_file)
    if os.path.exists(stem + ".parquet"):
        t, x, y, _ = dvs.read_parquet_events(stem + ".parquet")
        dims = (260, 346)  # AEDAT4/parquet sensor default (dvstools.py:154)
    elif os.path.exists(stem + ".zip"):
        t, x, y, _, (w, h) = dvs.read_zip_events(stem + ".zip")
        dims = (h, w)
    elif os.path.exists(stem + ".txt"):
        t, x, y, _, (w, h) = events_native.parse_text_events(stem + ".txt")
        dims = (h, w)
    else:
        raise FileNotFoundError(f"no {stem}.parquet/.zip/.txt")
    if dims[0] <= 0 or dims[1] <= 0:
        # The "width height" header is optional in text/zip event files;
        # without it the sensor geometry is unknown and every downstream
        # representation would crash obscurely (or silently emit 0x0
        # frames).  Infer it from the event extents, which is always a
        # valid crop for the representations this CLI builds.
        if len(x) == 0:
            raise ValueError(
                f"{stem}: no 'width height' header and no events to infer "
                "the sensor dimensions from"
            )
        dims = (int(y.max()) + 1, int(x.max()) + 1)
        print(
            f"note: no dimensions header in {args.input_file}; inferred "
            f"(h, w)={dims} from event extents",
            file=sys.stderr,
        )
    return t, x, y, dims


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    out_name = args.output_name or args.input_file

    if args.tool == "extract":
        path = dvs.extract_rosbag(args.dataset_folder, args.input_file, args.output_name)
        if path is None:
            print("rosbag is not installed; extraction unavailable", file=sys.stderr)
            return 1
        print(f"extracted to {path}")
        return 0

    if args.tool == "video":
        out = dvs.create_video_from_frames(
            os.path.join(args.dataset_folder, args.input_file),
            os.path.join(args.dataset_folder, out_name + ".mp4"),
            fps=args.timebin,
        )
        if out is None:
            print("OpenCV is not installed; video export unavailable", file=sys.stderr)
            return 1
        print(f"video saved to {out}")
        return 0

    t, x, y, dims = _load_events(args)
    hot = None
    if args.hot_pixels:
        hp_path = os.path.join(args.dataset_folder, args.hot_pixels + ".txt")
        if os.path.exists(hp_path):
            hot = dvs.read_hot_pixels_file(hp_path)

    out_dir = os.path.join(args.dataset_folder, out_name)
    if args.tool == "simple_rep":
        if args.reference:
            pm = dvs.PatchMap.create(dims, args.pixels, seed=args.seed)
            pm.save(args.dataset_folder, args.patch_tag)
        else:
            pm = dvs.PatchMap.load(args.dataset_folder, args.patch_tag)
        frames = dvs.simple_rep_frames(
            t, x, y, pm, timebin_hz=args.timebin,
            accum_factor=args.accum_factor, hot_pixels=hot,
            max_frames=args.frames_max,
        )
        dvs.save_frames_png(frames, out_dir)
    else:  # decay_rep
        frames = events_native.decay_frames(
            t, x, y, 1.0 / args.timebin, args.decay_factor, args.accum_factor,
            width=dims[1], height=dims[0], max_frames=args.frames_max,
        )
        dvs.save_frames_png(np.clip(frames, 0, 255), out_dir)
    print(f"wrote {len(frames)} frames to {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
