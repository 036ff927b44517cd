"""Offline DVS event-stream toolkit.

Re-design of reference lens/tools/dvstools.py (C16 in SURVEY.md §2):
  - rosbag extraction  (ExtractRosbag, dvstools.py:18-106) — gated on rosbag
  - zip/txt + parquet event readers (dvstools.py:114-171)
  - 'simple' frame representation: random-centroid 3x3-patch pixel subset
    accumulation (dvstools.py:221-329) — rebuilt as a vectorized pixel->slot
    lookup table instead of the reference's per-event dict scan
  - 'decay' frame representation: per-pixel exponential decay
    (dvstools.py:305-342) — runs in the native C++ engine
  - frames -> mp4 video (CreateVideo, dvstools.py:373-405)

All emitters write `images_%05d.png` frames compatible with the training and
inference data layer.
"""

from __future__ import annotations

import json
import os
import zipfile
from dataclasses import dataclass
from typing import Optional, Set, Tuple

import numpy as np
from PIL import Image

from lens_tpu.runtime import events_native


# --------------------------------------------------------------------------
# Extraction


def extract_rosbag(
    dataset_folder: str, input_file: str, output_name: str = ""
) -> Optional[str]:
    """rosbag /dvs/events -> '<name>.zip' containing '<name>.txt' with a
    'width height' header + 't x y pol' lines and an event_sum.txt
    (dvstools.py:33-106 format).  Returns the zip path, or None if the
    rosbag package is unavailable (it is not shipped in this image)."""
    try:
        import rosbag  # type: ignore
    except ImportError:
        return None

    name = output_name or os.path.splitext(os.path.basename(input_file))[0]
    txt_path = os.path.join(dataset_folder, f"{name}.txt")
    event_sum = 0
    width = height = None
    with open(txt_path, "w") as out, rosbag.Bag(
        os.path.join(dataset_folder, input_file)
    ) as bag:
        for topic, msg, _ in bag.read_messages():
            if topic != "/dvs/events":
                continue
            if width is None:
                width, height = msg.width, msg.height
                out.write(f"{width} {height}\n")
            for e in msg.events:
                t = e.ts.secs + e.ts.nsecs / 1e9
                out.write(f"{t:.12f} {e.x} {e.y} {1 if e.polarity else 0}\n")
                event_sum += 1
    sum_path = os.path.join(dataset_folder, "event_sum.txt")
    with open(sum_path, "w") as f:
        f.write(str(event_sum))
    zip_path = os.path.join(dataset_folder, f"{name}.zip")
    with zipfile.ZipFile(zip_path, "w") as z:
        z.write(txt_path, f"{name}.txt", compress_type=zipfile.ZIP_DEFLATED)
        z.write(sum_path, "event_sum.txt", compress_type=zipfile.ZIP_DEFLATED)
    os.remove(txt_path)
    os.remove(sum_path)
    return zip_path


def read_zip_events(zip_path: str, inner_name: Optional[str] = None):
    """Events + (width, height) from an extraction zip."""
    name = inner_name or os.path.splitext(os.path.basename(zip_path))[0] + ".txt"
    with zipfile.ZipFile(zip_path) as z, z.open(name) as f:
        import shutil
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".txt", delete=False) as tmp:
            shutil.copyfileobj(f, tmp)  # stream: no whole-file bytes object
            tmp_path = tmp.name
    try:
        t, x, y, pol, dims = events_native.parse_text_events(tmp_path)
    finally:
        os.remove(tmp_path)
    return t, x, y, pol, dims


def read_parquet_events(path: str):
    """Parquet with t/x/y[/p] columns, timestamps in microseconds
    (dvstools.py:130-132, 185-188)."""
    import pandas as pd

    df = pd.read_parquet(path)
    return (
        df["t"].to_numpy(np.float64) / 1e6,
        df["x"].to_numpy(np.uint16),
        df["y"].to_numpy(np.uint16),
        df["p"].to_numpy(np.uint8) if "p" in df else np.ones(len(df), np.uint8),
    )


def read_hot_pixels_file(path: str) -> Set[Tuple[int, int]]:
    """'x,y' per line exclusion list (dvstools.py:122-128)."""
    out: Set[Tuple[int, int]] = set()
    with open(path) as f:
        for line in f:
            if line.strip():
                x, y = map(int, line.strip().split(","))
                out.add((x, y))
    return out


# --------------------------------------------------------------------------
# Simple (random-centroid patch) representation


@dataclass
class PatchMap:
    """The pixel-subset sampling map of the 'simple' representation.

    `pixels` random unique centroids are drawn on the sensor; each centroid
    owns its 3x3 patch, and any event landing in a patch accumulates into the
    centroid's slot (dvstools.py:221-258).  Later patches overwrite earlier
    ones at overlaps, like the reference's dict reassignment.  The map is
    persisted so query traverses reuse the reference traverse's sampling
    (dvstools.py:248-260 save / 261-278 load).
    """

    centroids: np.ndarray  # (pixels,) flat sensor indices
    lookup: np.ndarray  # (H*W,) slot index or -1
    dims: Tuple[int, int]  # (H, W)

    @classmethod
    def create(
        cls, dims: Tuple[int, int], pixels: int, seed: Optional[int] = None
    ) -> "PatchMap":
        h, w = dims
        rng = np.random.default_rng(seed)
        centroids = rng.choice(h * w, size=pixels, replace=False)
        lookup = np.full(h * w, -1, np.int32)
        for slot, c in enumerate(centroids):
            row, col = divmod(int(c), w)
            for r in range(row - 1, row + 2):
                for cc in range(col - 1, col + 2):
                    if 0 <= r < h and 0 <= cc < w:
                        lookup[r * w + cc] = slot
        return cls(centroids=np.asarray(centroids), lookup=lookup, dims=dims)

    def save(self, folder: str, tag: str) -> None:
        np.savez_compressed(
            os.path.join(folder, f"{tag}_patchmap.npz"),
            centroids=self.centroids,
            lookup=self.lookup,
            dims=np.asarray(self.dims),
        )
        with open(os.path.join(folder, f"{tag}_centroids.json"), "w") as f:
            json.dump([int(c) for c in self.centroids], f)

    @classmethod
    def load(cls, folder: str, tag: str) -> "PatchMap":
        z = np.load(os.path.join(folder, f"{tag}_patchmap.npz"))
        return cls(
            centroids=z["centroids"],
            lookup=z["lookup"],
            dims=(int(z["dims"][0]), int(z["dims"][1])),
        )


def simple_rep_frames(
    t: np.ndarray,
    x: np.ndarray,
    y: np.ndarray,
    patch_map: PatchMap,
    timebin_hz: float,
    accum_factor: float = 1.0,
    hot_pixels: Optional[Set[Tuple[int, int]]] = None,
    max_frames: int = 100_000,
) -> np.ndarray:
    """(F, pixels) uint8 frames: per-bin accumulation of patch-mapped events
    (vectorized rebuild of dvstools.py:288-361's per-event loop)."""
    if len(t) == 0:
        return np.zeros((0, len(patch_map.centroids)), np.uint8)
    h, w = patch_map.dims
    # Events outside the patch map's sensor dims (a map inferred from one
    # traverse's extents reused on another) are IGNORED like the reference's
    # dict lookup would, not indexed out of range.
    in_dims = (x.astype(np.int64) < w) & (y.astype(np.int64) < h)
    if not in_dims.all():
        t, x, y = t[in_dims], x[in_dims], y[in_dims]
    if len(t) == 0:
        return np.zeros((0, len(patch_map.centroids)), np.uint8)
    if hot_pixels:
        # Vectorized exclusion: one boolean image indexed by the flat
        # coordinates (the per-event tuple-hash comprehension took tens of
        # seconds on a 1e7-event traverse).
        hot_mask = np.zeros(h * w, bool)
        for hx, hy in hot_pixels:
            if 0 <= hy < h and 0 <= hx < w:
                hot_mask[int(hy) * w + int(hx)] = True
        keep = ~hot_mask[y.astype(np.int64) * w + x.astype(np.int64)]
        t, x, y = t[keep], x[keep], y[keep]
    flat = y.astype(np.int64) * w + x.astype(np.int64)
    slots = patch_map.lookup[flat]
    sel = slots >= 0
    t, slots = t[sel], slots[sel]
    if len(t) == 0:
        return np.zeros((0, len(patch_map.centroids)), np.uint8)
    # Origin = the EARLIEST event, not the first row: loaders do not sort
    # (unlike collect.py), and with t[0] as origin an earlier event would
    # get a negative bin that np.add.at wraps into the LAST frames.
    bins = np.floor((t - t.min()) * timebin_hz).astype(np.int64)
    n_frames = min(int(bins.max()) + 1, max_frames)
    sel = bins < n_frames
    frames = np.zeros((n_frames, len(patch_map.centroids)), np.float64)
    np.add.at(frames, (bins[sel], slots[sel]), accum_factor)
    return np.clip(frames, 0, 255).astype(np.uint8)


def save_frames_png(frames: np.ndarray, output_dir: str) -> None:
    """Square-reshape and write images_%05d.png (dvstools.py:363-371)."""
    os.makedirs(output_dir, exist_ok=True)
    for i, fr in enumerate(frames):
        if fr.ndim == 1:
            side = int(np.sqrt(fr.shape[0]))
            if side * side != fr.shape[0]:
                raise ValueError(
                    f"frames have {fr.shape[0]} pixels, which is not a "
                    "perfect square — --pixels must be one (e.g. 49, 100) "
                    "to write square PNGs"
                )
            fr = fr.reshape(side, side)
        Image.fromarray(np.clip(fr, 0, 255).astype(np.uint8)).save(
            os.path.join(output_dir, f"images_{i:05d}.png")
        )


# --------------------------------------------------------------------------
# Video


def create_video_from_frames(
    frames_dir: str, output_file: str, fps: float
) -> Optional[str]:
    """PNG frames -> mp4 (CreateVideo, dvstools.py:378-405).  Returns the
    output path or None if OpenCV is unavailable."""
    try:
        import cv2  # type: ignore
    except ImportError:
        return None
    names = sorted(
        (f for f in os.listdir(frames_dir) if f.endswith(".png")),
        key=lambda s: int("".join(ch for ch in s if ch.isdigit()) or 0),
    )
    if not names:
        raise ValueError("No frames found in the specified folder.")
    first = cv2.imread(os.path.join(frames_dir, names[0]), cv2.IMREAD_COLOR)
    if first is None:
        raise ValueError(
            f"could not read {names[0]} in {frames_dir} (corrupt or not an "
            "image) — needed to size the video"
        )
    h, w = first.shape[:2]
    video = cv2.VideoWriter(
        output_file, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    for name in names:
        frame = cv2.imread(os.path.join(frames_dir, name), cv2.IMREAD_COLOR)
        if frame is not None:
            video.write(frame)
    video.release()
    return output_file
