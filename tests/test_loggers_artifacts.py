import logging
import os

import numpy as np

from lens_tpu.runtime import artifacts
from lens_tpu.utils.loggers import model_logger
from lens_tpu.utils.table import ascii_table


def test_model_logger_creates_run_dir(tmp_path):
    logger, folder = model_logger(str(tmp_path / "out"))
    assert os.path.isdir(folder)
    logger.info("hello artifact")
    for h in logger.handlers:
        h.flush()
    log = open(os.path.join(folder, "lens.log")).read()
    assert "hello artifact" in log
    assert "LENS" in log  # banner present


def test_model_logger_unique_dirs(tmp_path):
    _, a = model_logger(str(tmp_path / "out"))
    _, b = model_logger(str(tmp_path / "out"))
    assert a != b  # same-second collisions disambiguated
    logging.getLogger("LENS").handlers.clear()


def test_ascii_table_layout():
    t = ascii_table(["N", "1", "5"], [["Recall", 0.5, 0.88]])
    lines = t.split("\n")
    assert len(lines) == 5
    assert lines[0].startswith("+") and "Recall" in lines[3]
    assert all(len(line) == len(lines[0]) for line in lines)


def test_artifact_pdfs(tmp_path):
    m = np.random.default_rng(0).random((10, 10))
    artifacts.save_matrix_pdf(m, str(tmp_path / "m.pdf"))
    artifacts.save_similarity_heatmap(m, str(tmp_path / "h.pdf"))
    if artifacts.HAVE_MPL:
        assert (tmp_path / "m.pdf").stat().st_size > 0
        assert (tmp_path / "h.pdf").stat().st_size > 0


def test_pr_comparison_artifacts(tmp_path):
    pr = {"Precision": [1.0, 0.9], "Recall": [0.0, 0.5]}
    artifacts.plot_pr_comparison(pr, pr, str(tmp_path))
    artifacts.plot_recall_comparison([0.5] * 6, [0.4] * 6, [1, 5, 10, 15, 20, 25],
                                     str(tmp_path))
    assert (tmp_path / "PR_curve_LENS.json").exists()
    assert (tmp_path / "PR_curve_SAD.json").exists()
    csv = (tmp_path / "SAD_vs_LENS_RecallatN.csv").read_text()
    assert csv.startswith("N,SAD,LENS")
