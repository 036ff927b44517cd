"""Output artifacts: the exact file types/paths the reference emits
(SURVEY.md §5 observability: distance_matrix_lens.pdf, GTtol.pdf,
similarity_matrix_{LENS,SAD}.pdf, Precision_Recall_plot.pdf,
SAD_vs_LENS_RecallatN.{pdf,csv}, PR_curve_{LENS,SAD}.json,
similarity_matrix.npy, spike_data.npy, power_data.npy).

All matplotlib use is centralized here and gated, keeping metrics/compute
modules free of plotting dependencies.
"""

from __future__ import annotations

import csv
import json
import os
from typing import Dict, List, Sequence

import numpy as np

try:  # pragma: no cover - availability depends on environment
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    HAVE_MPL = True
except ImportError:  # pragma: no cover
    HAVE_MPL = False


class NpyAppender:
    """Append-only `.npy` writer for unbounded streams.

    The streaming mode used to rebuild spike_data.npy / similarity_matrix.npy
    from an ever-growing in-memory list on every flush — quadratic IO and
    linear RSS over hour-scale streams.  This writer appends rows in O(row)
    IO and holds NO row data in memory; each flush() rewrites only the
    fixed-size header (the leading dimension is zero-padded to 12 digits so
    the header length never changes), leaving the file a complete, valid
    `.npy` of every row so far — the same crash-durability the periodic full
    rewrite provided, at linear total IO.
    """

    _MAGIC = b"\x93NUMPY\x01\x00"

    def __init__(self, path: str, row_shape: Sequence[int], dtype) -> None:
        self.path = path
        self.row_shape = tuple(int(s) for s in row_shape)
        self.dtype = np.dtype(dtype)
        self.n_rows = 0
        self._f = open(path, "w+b")
        self._write_header()

    def _write_header(self) -> None:
        import struct

        descr = np.lib.format.dtype_to_descr(self.dtype)
        dims = ["%12d" % self.n_rows] + [str(s) for s in self.row_shape]
        shape = "(" + ", ".join(dims) + ("," if len(dims) == 1 else "") + ")"
        header = "{'descr': %r, 'fortran_order': False, 'shape': %s, }" % (
            descr,
            shape,
        )
        base = len(self._MAGIC) + 2  # magic + u16 header length
        pad = (64 - (base + len(header) + 1) % 64) % 64
        header = header + " " * pad + "\n"
        self._f.seek(0)
        self._f.write(self._MAGIC)
        self._f.write(struct.pack("<H", len(header)))
        self._f.write(header.encode("latin1"))

    def append(self, row: np.ndarray) -> None:
        row = np.asarray(row, self.dtype)  # asarray keeps 0-d rows 0-d
        if row.shape != self.row_shape:
            raise ValueError(f"row shape {row.shape} != {self.row_shape}")
        self._f.seek(0, os.SEEK_END)
        self._f.write(row.tobytes())  # tobytes always emits C order
        self.n_rows += 1

    def append_rows(self, block: np.ndarray) -> None:
        block = np.asarray(block, self.dtype)
        if block.shape[1:] != self.row_shape:
            raise ValueError(f"block row shape {block.shape[1:]} != {self.row_shape}")
        self._f.seek(0, os.SEEK_END)
        self._f.write(block.tobytes())
        self.n_rows += int(block.shape[0])

    def flush(self) -> None:
        """Make the file a valid .npy of everything appended so far."""
        self._write_header()
        self._f.flush()

    def close(self) -> None:
        if not self._f.closed:
            self.flush()
            self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def save_matrix_pdf(matrix: np.ndarray, path: str, title: str | None = None) -> None:
    """imshow + colorbar, as run_model.py:257-260 / 296-299."""
    if not HAVE_MPL:
        return
    plt.figure()
    plt.imshow(np.asarray(matrix))
    plt.colorbar()
    if title:
        plt.title(title)
    plt.savefig(path)
    plt.close()


def save_similarity_heatmap(matrix: np.ndarray, path: str) -> None:
    """The --sim_mat heatmap (run_model.py:310-316; saved, not shown —
    headless TPU hosts have no display)."""
    if not HAVE_MPL:
        return
    plt.figure(figsize=(10, 8))
    try:
        import seaborn as sns

        sns.heatmap(np.asarray(matrix), annot=False, cmap="crest")
    except ImportError:
        plt.imshow(np.asarray(matrix), aspect="auto")
        plt.colorbar()
    plt.title("Similarity matrix")
    plt.xlabel("Query")
    plt.ylabel("Database")
    plt.savefig(path)
    plt.close()


def save_pr_overlay(
    S_in: np.ndarray,
    GThard: np.ndarray,
    overlay: Dict[str, np.ndarray],
    outputdir: str,
    datatype: str = "LENS",
) -> None:
    """TP/FP overlay on the similarity matrix at the loosest threshold
    (the plot createPR embeds at metrics.py:93-137)."""
    if not HAVE_MPL or not overlay:
        return
    fig, ax = plt.subplots(figsize=(10, 8))
    cax = ax.imshow(np.asarray(S_in), cmap="viridis", aspect="auto")
    fig.colorbar(cax, ax=ax, label="Similarity Score")
    ax.set_title(f"{datatype} Similarity Matrix with Ground Truth, TP, and FP")
    gt_y, gt_x = np.where(np.asarray(GThard))
    ax.scatter(gt_x, gt_y, facecolors="white", edgecolors="white", marker=".",
               label="Ground Truth", linewidths=0.5)
    ax.scatter(overlay["tp_cols"], overlay["tp_rows"], facecolors="none",
               edgecolors="green", marker="o", label="True Positives", linewidths=1.0)
    ax.scatter(overlay["fp_cols"], overlay["fp_rows"], marker="x", color="red",
               label="False Positives", linewidths=1.0)
    ax.legend(loc="upper right", bbox_to_anchor=(1.0, 1))
    ax.set_xlabel("Query Index")
    ax.set_ylabel("Database Index")
    plt.tight_layout()
    plt.savefig(os.path.join(outputdir, f"similarity_matrix_{datatype}.pdf"), dpi=300)
    plt.close(fig)


def plot_pr_comparison(lens_pr: Dict, sad_pr: Dict, output_path: str) -> None:
    """LENS vs SAD PR overlay + JSON dumps (reference plot_results.py:6-32)."""
    if HAVE_MPL:
        plt.figure(figsize=(8, 4))
        plt.plot(sad_pr["Recall"], sad_pr["Precision"], label="SAD", color="#D753CC")
        plt.plot(lens_pr["Recall"], lens_pr["Precision"], label="LENS", color="#575AB1")
        plt.title("Precision-Recall Comparison")
        plt.xlabel("Recall")
        plt.ylabel("Precision")
        plt.legend()
        plt.xlim(0.0, 1.0)
        plt.ylim(0.0, 1.05)
        plt.savefig(os.path.join(output_path, "Precision_Recall_plot.pdf"), dpi=300)
        plt.close()
    with open(os.path.join(output_path, "PR_curve_LENS.json"), "w") as f:
        json.dump(lens_pr, f)
    with open(os.path.join(output_path, "PR_curve_SAD.json"), "w") as f:
        json.dump(sad_pr, f)


def plot_recall_comparison(
    lens_recall: Sequence[float],
    sad_recall: Sequence[float],
    N: Sequence[int],
    output_path: str,
) -> None:
    """Recall@N comparison plot + CSV (reference plot_results.py:34-60)."""
    if HAVE_MPL:
        plt.figure(figsize=(8, 4))
        plt.plot(N, sad_recall, label="SAD", color="#D753CC", marker="o")
        plt.plot(N, lens_recall, label="LENS", color="#575AB1", marker="o")
        plt.title("Comparison of SAD and LENS")
        plt.xlabel("N")
        plt.ylabel("Values")
        plt.ylim(0, 1)
        plt.legend()
        plt.savefig(os.path.join(output_path, "SAD_vs_LENS_RecallatN.pdf"), dpi=300)
        plt.close()
    with open(os.path.join(output_path, "SAD_vs_LENS_RecallatN.csv"), "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["N", "SAD", "LENS"])
        for n, s, l in zip(N, sad_recall, lens_recall):
            writer.writerow([n, s, l])
