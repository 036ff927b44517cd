"""Long-stream memory/IO bounds: the NpyAppender artifact writer and a
multi-thousand-bin soak through the online matcher (VERDICT r2 ask #5 —
hour-scale streams must have flat RSS and linear artifact IO, where the old
in-memory list + full np.save rewrite was linear RSS / quadratic IO)."""

import logging
import os

import numpy as np
import pytest

from lens_tpu.runtime.artifacts import NpyAppender
from lens_tpu.runtime.stream import (
    QUERIES_PER_SEQUENCE,
    SEQUENCE_ROWS,
    OnlineMatcher,
)


@pytest.mark.parametrize("row_shape,dtype", [((7,), np.int32), ((3, 4), np.float64), ((), np.int64)])
def test_appender_roundtrips_like_np_save(tmp_path, row_shape, dtype):
    path = str(tmp_path / "a.npy")
    rng = np.random.default_rng(0)
    rows = [
        (rng.normal(size=row_shape) * 100).astype(dtype) for _ in range(23)
    ]
    with NpyAppender(path, row_shape, dtype) as ap:
        for r in rows[:11]:
            ap.append(r)
        ap.append_rows(np.stack(rows[11:]))
    loaded = np.load(path)
    np.testing.assert_array_equal(loaded, np.stack(rows))
    assert loaded.dtype == np.dtype(dtype)


def test_appender_is_valid_npy_after_every_flush(tmp_path):
    """Crash durability: at any flush point the file on disk is a complete,
    loadable .npy of every row appended so far — even while still open."""
    path = str(tmp_path / "stream.npy")
    ap = NpyAppender(path, (5,), np.int32)
    sizes = []
    for i in range(300):
        ap.append(np.full(5, i, np.int32))
        if (i + 1) % 50 == 0:
            ap.flush()
            arr = np.load(path)  # readable while the writer is still open
            assert arr.shape == (i + 1, 5)
            assert arr[-1, 0] == i
            sizes.append(os.path.getsize(path))
    ap.close()
    # Linear IO: file size grows by exactly rows*itemsize per window (the
    # header is constant-size; nothing is ever rewritten except the header).
    deltas = np.diff(sizes)
    assert (deltas == 50 * 5 * 4).all()
    # Header length is independent of the row count (12-digit padding).
    final = np.load(path)
    assert final.shape == (300, 5)


def test_appender_rejects_wrong_shape(tmp_path):
    ap = NpyAppender(str(tmp_path / "b.npy"), (4,), np.float32)
    with pytest.raises(ValueError):
        ap.append(np.zeros(5, np.float32))
    with pytest.raises(ValueError):
        ap.append_rows(np.zeros((2, 5), np.float32))
    ap.close()


def test_matcher_soak_flat_memory_linear_io(tmp_path, monkeypatch):
    """>=5k bins through the online matcher: in-memory state stays bounded
    (rows buffer < one block, matrix capped to the keep-tail), while the
    on-disk similarity_matrix.npy accumulates every block and stays loadable
    mid-run."""
    n_places, n_bins = 64, 6000
    keep = 64
    monkeypatch.setattr(OnlineMatcher, "MATRIX_KEEP_COLS", keep)
    logger = logging.getLogger("soak")
    logger.addHandler(logging.NullHandler())
    logger.propagate = False
    m = OnlineMatcher(n_places, 2, str(tmp_path), logger)
    rng = np.random.default_rng(1)
    matrix_path = tmp_path / "similarity_matrix.npy"
    bins_per_block = QUERIES_PER_SEQUENCE * SEQUENCE_ROWS
    for i in range(n_bins):
        m.push(rng.integers(0, 50, n_places).astype(np.int32))
        # Bounded in-memory state at every step.
        assert len(m._rows) < SEQUENCE_ROWS
        assert m._bins < QUERIES_PER_SEQUENCE
        if m.matrix is not None:
            assert m.matrix.shape[1] <= keep
        if i == n_bins // 2:  # crash durability mid-stream
            mid = np.load(matrix_path)
            assert mid.shape == (
                ((i + 1) // bins_per_block) * SEQUENCE_ROWS,
                n_places,
            )
    m.close()
    total_blocks = n_bins // bins_per_block
    disk = np.load(matrix_path)
    assert disk.shape == (total_blocks * SEQUENCE_ROWS, n_places)
    assert len(m.matches) == total_blocks * SEQUENCE_ROWS
    # The in-memory tail equals the newest disk columns.
    np.testing.assert_array_equal(m.matrix.T[-keep:], disk[-keep:])
    # Linear IO: the artifact is exactly header + rows (never rewritten).
    assert os.path.getsize(matrix_path) == 128 + disk.size * 8 or (
        os.path.getsize(matrix_path) - disk.size * 8
    ) % 64 == 0


def test_event_driven_spike_file_appends(tiny_dataset_cfg):
    """run_event_driven writes spike_data.npy through the appender: the file
    is a valid .npy with one row per bin, identical content to before."""
    from dataclasses import replace

    from lens_tpu.runtime.stream import run_event_driven
    from lens_tpu.train_model import run_training

    cfg = tiny_dataset_cfg
    path = os.path.join(cfg.models_dir, cfg.model_name(".npz"))
    if not os.path.exists(path):
        run_training(replace(cfg, train_model=True))
    run_event_driven(replace(cfg, event_driven=True, headless=True))
    out_dirs = sorted(os.listdir(cfg.output_base))
    newest = os.path.join(cfg.output_base, out_dirs[-1])
    spikes = np.load(os.path.join(newest, "spike_data.npy"))
    assert spikes.shape == (cfg.query_places, cfg.reference_places)
    assert spikes.dtype == np.int32
