"""Sum-of-absolute-differences VPR baseline (reference lens/src/sad.py:25-69).

Loads both traverses' PNGs, computes the L1 pairwise distance on device,
applies the same eye-kernel sequence conv, and evaluates PR/Recall@N on the
inverted distances.
"""

from __future__ import annotations

import logging
import os
import re
from typing import Dict, List, Tuple

import numpy as np
from PIL import Image

from lens_tpu.metrics.vpr import create_pr, recall_at_k
from lens_tpu.ops.cdist import l1_cdist
from lens_tpu.ops.seqmatch import sequence_conv
from lens_tpu.runtime.artifacts import save_matrix_pdf, save_pr_overlay
from lens_tpu.utils.table import ascii_table


def _natural_key(s: str):
    return [int(t) if t.isdigit() else t.lower() for t in re.split(r"([0-9]+)", s)]


def load_image_folder(
    folder: str, skip: int = 1, max_images: int = 0
) -> np.ndarray:
    """PNGs in natural-sort order, flattened (sad.py:15-23), with the same
    every-`skip` / first-`max_images` selection the LENS dataset loader
    applies (dataset.py:76-94) so both pipelines see the same traverse."""
    names = sorted(
        (f for f in os.listdir(folder) if f.endswith(".png")), key=_natural_key
    )[:: max(int(skip), 1)]
    if max_images > 0:
        names = names[:max_images]
    imgs = [
        np.asarray(Image.open(os.path.join(folder, f)).convert("L"), np.float32).ravel()
        for f in names
    ]
    return np.stack(imgs)


def run_sad(
    reference_dir: str,
    query_dir: str,
    GT: np.ndarray,
    outputdir: str,
    sequence_length: int,
    skip: int = 1,
    n_ref: int = 0,
    n_query: int = 0,
) -> Tuple[Dict[str, List[float]], List[float]]:
    """Returns (PR data dict, Recall@N list) like reference run_sad.

    Documented deviation: the reference loads EVERY PNG in each folder
    (sad.py:15-23) while its LENS pipeline caps/filters via the dataset CSV,
    so with oversized folders or --filter > 1 its SAD matrix shape cannot
    match the GT (crash) or silently scores a different image subset.  Here
    the same skip/cap selection applies to both pipelines.
    """
    queries = load_image_folder(query_dir, skip, n_query)
    references = load_image_folder(reference_dir, skip, n_ref)

    dist = np.asarray(l1_cdist(queries, references))  # (Q, R)
    dist_seq = np.asarray(sequence_conv(dist, sequence_length))

    save_matrix_pdf(dist_seq, os.path.join(outputdir, "distance_matrix_SAD.pdf"))

    # Similarity = 1/distance (sad.py:52, 62).  The reference produces inf on
    # zero distances, which poisons the PR threshold grid; clamping to the
    # smallest positive distance is a rank-preserving, finite equivalent.
    floor = dist_seq[dist_seq > 0].min() if (dist_seq > 0).any() else 1.0
    inv = 1.0 / np.maximum(dist_seq, floor)
    P, R, overlay = create_pr(inv, GT, matching="single", n_thresh=100)
    save_pr_overlay(inv, GT, overlay, outputdir, datatype="SAD")
    pr_data = {"Precision": P, "Recall": R}

    N = [1, 5, 10, 15, 20, 25]
    recallatn = [round(recall_at_k(inv, GT, K=n), 2) for n in N]
    table = ascii_table(
        ["N", "1", "5", "10", "15", "20", "25"], [["Recall", *recallatn]]
    )
    logging.getLogger("LENS").info("\n%s", table)
    return pr_data, recallatn
