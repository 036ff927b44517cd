"""FullOnlineMatcher (--online_matcher full): the incremental streaming
matcher must reproduce the OFFLINE sequence pipeline exactly.

The claim in BENCHMARKS.md's matched-L characterization is that a live run
with the full matcher gets the offline pipeline's accuracy (where LENS beats
SAD at matched L); that is only true if the incrementally-emitted columns
equal ops/seqmatch.sequence_conv bit-for-bit on the same counts.
"""

import os
from dataclasses import replace

import jax.numpy as jnp
import numpy as np
import pytest

from lens_tpu.runtime.stream import FullOnlineMatcher, make_online_matcher
from lens_tpu.ops.seqmatch import sequence_conv


class _SilentLogger:
    def info(self, *a, **k):
        pass


def _push_all(matcher, counts):
    for row in counts:
        matcher.push(row)
    matcher.close()


@pytest.mark.parametrize("L", [1, 2, 4, 7, 10])
def test_full_matcher_equals_offline_sequence_conv(tmp_path, L):
    rng = np.random.default_rng(11 + L)
    Q, R = 30, 20
    counts = rng.integers(0, 200, (Q, R)).astype(np.int32)
    out = str(tmp_path / f"L{L}")
    os.makedirs(out)
    m = FullOnlineMatcher(R, L, out, _SilentLogger())
    _push_all(m, counts)

    d_offline = np.asarray(sequence_conv(jnp.asarray(counts, jnp.float32), L))
    d_stream = np.load(os.path.join(out, "distance_matrix_online.npy"))
    assert d_stream.shape == (Q - L + 1, R - L + 1)
    # int sums / L: float64 stream vs float32 offline — exact at these
    # magnitudes after casting.
    np.testing.assert_array_equal(d_stream.astype(np.float32), d_offline.T)
    # one match per completed query window, = the offline argmax
    assert m.n_matches_total == Q - L + 1
    assert m.matches == [int(j) for j in np.argmax(d_offline, axis=0)]


def test_full_matcher_warmup_emits_nothing(tmp_path):
    out = str(tmp_path / "warm")
    os.makedirs(out)
    m = FullOnlineMatcher(16, 5, out, _SilentLogger())
    for row in np.ones((4, 16), np.int32):
        m.push(row)
    m.close()
    assert m.n_matches_total == 0
    assert np.load(os.path.join(out, "distance_matrix_online.npy")).shape == (0, 12)


def test_full_matcher_flat_memory_on_long_streams(tmp_path):
    """The rolling window holds exactly L rows and the in-memory matrix tail
    is bounded; an unbounded stream must not grow host state."""
    out = str(tmp_path / "long")
    os.makedirs(out)
    m = FullOnlineMatcher(8, 3, out, _SilentLogger())
    m.MATRIX_KEEP_COLS = 10
    m.MATCHES_KEEP = 10
    rng = np.random.default_rng(0)
    for row in rng.integers(0, 50, (200, 8)).astype(np.int32):
        m.push(row)
    assert len(m._window) == 3 - 1  # steady state: one row popped per emit
    assert m.matrix.shape[1] <= 10
    assert len(m.matches) <= 10
    assert m.n_matches_total == 198
    m.close()
    assert np.load(os.path.join(out, "distance_matrix_online.npy")).shape == (198, 6)


def test_make_online_matcher_dispatch_and_validation(tmp_path, tiny_dataset_cfg):
    out = str(tmp_path / "mk")
    os.makedirs(out)
    cfg = replace(tiny_dataset_cfg, online_matcher="full")
    m = make_online_matcher(cfg, out, _SilentLogger())
    assert isinstance(m, FullOnlineMatcher)
    m.close()
    with pytest.raises(ValueError, match="online_matcher"):
        make_online_matcher(
            replace(tiny_dataset_cfg, online_matcher="bogus"), out, _SilentLogger()
        )


def test_event_driven_full_matcher_e2e(tiny_dataset_cfg, tmp_path):
    """--event_driven --online_matcher full end to end on a recorded stream:
    the run's distance_matrix_online.npy equals sequence_conv over the
    spike_data.npy counts the same run persisted."""
    from lens_tpu.runtime.stream import run_event_driven
    from lens_tpu.tools.make_event_stream import synthesize_events
    from lens_tpu.train_model import run_training

    cfg = tiny_dataset_cfg
    model_path = os.path.join(cfg.models_dir, cfg.model_name(".npz"))
    if not os.path.exists(model_path):
        run_training(replace(cfg, train_model=True))
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 90, (12, cfg.roi_dim, cfg.roi_dim)).astype(np.float64)
    events = synthesize_events(
        frames, cfg.timebin / 1000.0, 2500, roi_origin=cfg.roi_origin, seed=4
    )
    stream = str(tmp_path / "stream.npy")
    np.save(stream, events)
    out_base = str(tmp_path / "out_full")

    L = 3
    m = run_event_driven(
        replace(
            cfg,
            event_driven=True,
            headless=True,
            event_file=stream,
            sequence_length=L,
            online_matcher="full",
            output_base=out_base,
        )
    )
    runs = sorted(
        os.path.join(out_base, d) for d in os.listdir(out_base)
    )
    newest = runs[-1]
    counts = np.load(os.path.join(newest, "spike_data.npy"))
    d_stream = np.load(os.path.join(newest, "distance_matrix_online.npy"))
    d_offline = np.asarray(
        sequence_conv(jnp.asarray(counts, jnp.float32), L)
    )
    np.testing.assert_array_equal(d_stream.astype(np.float32), d_offline.T)
    assert m.n_matches_total == counts.shape[0] - L + 1
