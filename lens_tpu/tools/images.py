"""Small image-folder utilities.

Reference counterparts: lens/tools/rename_images.py (natural-sort rename to
images_%05d.png) and lens/tools/manual_eventframe_generator.py (rebuild
frames from saved per-bin event arrays).
"""

from __future__ import annotations

import os
import re
from typing import List, Optional

import numpy as np
from PIL import Image


def _natural_key(s: str):
    return [int(t) if t.isdigit() else t.lower() for t in re.split(r"([0-9]+)", s)]


def rename_images(folder: str, prefix: str = "images_") -> List[str]:
    """Natural-sort all PNGs and rename to `<prefix>%05d.png`
    (rename_images.py semantics).  Returns the new names in order."""
    names = sorted(
        (f for f in os.listdir(folder) if f.endswith(".png")), key=_natural_key
    )
    # Two-phase rename so overlapping names never collide.
    tmp_names = []
    for i, name in enumerate(names):
        tmp = os.path.join(folder, f".tmp_rename_{i:05d}.png")
        os.rename(os.path.join(folder, name), tmp)
        tmp_names.append(tmp)
    out = []
    for i, tmp in enumerate(tmp_names):
        final = f"{prefix}{i:05d}.png"
        os.rename(tmp, os.path.join(folder, final))
        out.append(final)
    return out


def frames_from_event_arrays(
    events_dir: str,
    output_dir: str,
    roi_dim: int = 80,
    clip: Optional[int] = 255,
) -> int:
    """Rebuild PNG frames from saved per-bin event .npy files (the
    `--save_input` artifacts; manual_eventframe_generator.py semantics).
    Each file holds either an (roi, roi) count frame or an (N, >=2) array of
    (x, y[, ...]) event coordinates."""
    os.makedirs(output_dir, exist_ok=True)
    names = sorted(
        (f for f in os.listdir(events_dir) if f.endswith(".npy")), key=_natural_key
    )
    for i, name in enumerate(names):
        arr = np.load(os.path.join(events_dir, name), allow_pickle=True)
        if arr.ndim == 2 and arr.shape == (roi_dim, roi_dim):
            frame = arr.astype(np.int64)
        else:
            frame = np.zeros((roi_dim, roi_dim), np.int64)
            coords = np.asarray(arr)
            if coords.ndim == 2 and coords.shape[1] >= 2:
                xs = coords[:, 0].astype(int)
                ys = coords[:, 1].astype(int)
                keep = (xs >= 0) & (xs < roi_dim) & (ys >= 0) & (ys < roi_dim)
                np.add.at(frame, (ys[keep], xs[keep]), 1)
        if clip is not None:
            frame = np.clip(frame, 0, clip)
        Image.fromarray(frame.astype(np.uint8)).save(
            os.path.join(output_dir, f"images_{i:05d}.png")
        )
    return len(names)
