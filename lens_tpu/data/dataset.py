"""Data layer: CSV-annotated PNG event-frame datasets.

TPU-first redesign of the reference's per-item torch DataLoader pipeline
(reference lens/src/dataset.py:54-130).  Instead of a Python worker pool
yielding one (T,1,80,80) raster per query, we load the *entire* traverse into
one contiguous uint8 array on the host and ship it to the device in a single
transfer; rasterization and downsampling happen on-device inside the jitted
program (see ops/raster.py and core/network.py).  This removes the per-query
host loop that dominates the reference's runtime (SURVEY.md §3.1).

Semantics preserved:
  - CSV schema `Image_name,index[,gps_coordinate]` (dataset.py:76-77)
  - row filter `iloc[::skip]` then `iloc[:max_samples]` (dataset.py:80-84)
  - training path: center-pixel downsample THEN gamma-correct to mean gray
    (dataset.py:108-110 applies conv*255; ProcessImage(is_train=True)
    dataset.py:37-45 applies gamma = log(127.5)/log(mean) with silent skip on
    failure), finally /255
  - query path: raw /255 intensities (ProcessImage, dataset.py:14-26)
"""

from __future__ import annotations

import csv
import math
import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image


def center_pixel_indices(roi_dim: int, dims: int) -> Tuple[np.ndarray, np.ndarray]:
    """Row/col indices selected by the reference's center-pixel conv.

    The reference builds a Conv2d(k=roi//dims, stride=k) whose kernel is 1 at
    (k//2-1, k//2-1) and 0 elsewhere (run_model.py:129-137, dataset.py:58-62),
    i.e. output[i, j] = input[k*i + c, k*j + c] with c = k//2 - 1.  For k=1
    (e.g. the 7x7 brisevent frames) the torch index -1 wraps inside the 1x1
    kernel to 0 — reproduced here with the modulo.
    """
    k = roi_dim // dims
    c = ((k // 2) - 1) % k
    idx = c + k * np.arange(dims)
    return idx, idx


def center_pixel_flat_indices(roi_dim: int, dims: int) -> np.ndarray:
    """Flattened (row-major) indices into an (roi, roi) image for the selected
    center pixels — used to subset the shared Bernoulli threshold tensor so the
    downsample can be hoisted before rasterization (they commute elementwise)."""
    rows, cols = center_pixel_indices(roi_dim, dims)
    rr, cc = np.meshgrid(rows, cols, indexing="ij")
    return (rr * roi_dim + cc).reshape(-1)


def gamma_correct(img: np.ndarray) -> np.ndarray:
    """Gamma-correct a [0,255] image toward mean gray 127.5.

    Reference ProcessImage.__call__ (dataset.py:37-45): gamma =
    log(0.5*255)/log(mean(img)); img**gamma clipped to [0,255].  The reference
    silently skips the correction when the computation fails (mean <= 0, or
    mean == 1 giving log 0); we reproduce that guard explicitly.

    Preserved quirk: for 0 < mean < 1 (a nearly black frame) gamma is
    NEGATIVE and 0**gamma = inf clips to 255 — the frame inverts to
    saturated white.  The reference's bare try/except does not catch this
    (no exception is raised), so the inversion is its actual training-path
    behavior and is kept for parity.
    """
    img = img.astype(np.float32)
    mean = float(img.mean())
    if mean <= 0.0 or mean == 1.0:
        return img
    try:
        gamma = math.log(0.5 * 255.0) / math.log(mean)
    except ValueError:
        return img
    return np.clip(np.power(img, gamma), 0.0, 255.0)


def _read_annotations(annotations_file: str) -> List[Tuple[str, int, str]]:
    rows: List[Tuple[str, int, str]] = []
    with open(annotations_file, newline="") as f:
        reader = csv.reader(f)
        header = next(reader, None)
        if header is None:
            raise ValueError(
                f"annotations file is empty (no header row): {annotations_file}"
            )
        has_gps = len(header) > 2
        for r in reader:
            if not r:
                continue
            gps = r[2] if has_gps and len(r) > 2 else ""
            rows.append((r[0], int(r[1]), gps))
    return rows


@dataclass
class FrameDataset:
    """A fully materialized traverse: frames + labels as numpy arrays."""

    frames: np.ndarray  # (N, roi, roi) uint8
    labels: np.ndarray  # (N,) int32 — CSV 'index' column
    gps: List[str]
    paths: List[str]

    def __len__(self) -> int:
        return self.frames.shape[0]

    @classmethod
    def load(
        cls,
        annotations_file: str,
        img_dir: str,
        skip: int = 1,
        max_samples: Optional[int] = None,
    ) -> "FrameDataset":
        """Load a traverse; mirrors CustomImageDataset.__init__ filtering
        (dataset.py:76-94): every `skip`-th row, capped at `max_samples`."""
        rows = _read_annotations(annotations_file)[::skip]
        if max_samples is not None:
            rows = rows[:max_samples]
        if not rows:
            raise ValueError(
                f"no frames selected from {annotations_file} "
                f"(skip={skip}, max_samples={max_samples}); the CSV may be "
                "header-only or the filter larger than the traverse"
            )
        frames, labels, gps, paths = [], [], [], []
        for name, label, g in rows:
            path = os.path.join(img_dir, name)
            if not os.path.exists(path):
                raise FileNotFoundError(f"No file found at {path}.")
            img = np.asarray(Image.open(path).convert("L"), dtype=np.uint8)
            frames.append(img)
            labels.append(label)
            gps.append(g)
            paths.append(path)
        return cls(
            frames=np.stack(frames).astype(np.uint8),
            labels=np.asarray(labels, dtype=np.int32),
            gps=gps,
            paths=paths,
        )

    # ---- derived views -------------------------------------------------

    def query_intensities(self) -> np.ndarray:
        """(N, roi*roi) float32 in [0,1] — the inference input
        (ProcessImage + SetImageAsSpikes, dataset.py:14-26)."""
        n = len(self)
        return (self.frames.reshape(n, -1).astype(np.float32)) / 255.0

    def query_intensities_downsampled(self, dims: int) -> np.ndarray:
        """(N, dims*dims) float32 in [0,1] — center pixels only.

        Equivalent to rastering at full resolution then applying the
        reference's center-pixel conv (run_model.py:136-143): selection and
        Bernoulli thresholding commute elementwise.
        """
        roi = self.frames.shape[1]
        sel = center_pixel_flat_indices(roi, dims)
        n = len(self)
        return self.frames.reshape(n, -1)[:, sel].astype(np.float32) / 255.0

    def train_intensities(self, dims: int) -> np.ndarray:
        """(N, dims*dims) float32 in [0,1] — the STDP training input.

        Reference training path (dataset.py:108-113 then ProcessImage
        is_train=True): center-pixel conv on img/255, times 255 (= raw center
        pixel values), gamma correction toward mean gray, then /255.  Training
        uses analog intensities, never Bernoulli rasters (SURVEY.md §3.2).
        """
        roi = self.frames.shape[1]
        rows, cols = center_pixel_indices(roi, dims)
        down = self.frames[:, rows][:, :, cols].astype(np.float32)  # (N,d,d)
        out = np.stack([gamma_correct(im) for im in down])
        return out.reshape(len(self), -1) / 255.0
