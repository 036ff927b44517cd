import numpy as np
import pytest

from lens_tpu.ops.seqmatch import online_sequence_conv, sequence_conv

scipy_signal = pytest.importorskip("scipy.signal")


def _torch_style_seq_conv(sim, L):
    """Oracle for the offline matcher: the reference's conv2d with an eye
    kernel (run_model.py:248-252), written with numpy correlate semantics."""
    q, r = sim.shape
    out = np.zeros((q - L + 1, r - L + 1))
    for i in range(q - L + 1):
        for j in range(r - L + 1):
            out[i, j] = sum(sim[i + k, j + k] for k in range(L)) / L
    return out.T


@pytest.mark.parametrize("L", [1, 2, 4])
def test_sequence_conv_matches_oracle(L):
    rng = np.random.default_rng(0)
    sim = rng.random((10, 12))
    got = np.asarray(sequence_conv(sim, L))
    np.testing.assert_allclose(got, _torch_style_seq_conv(sim, L), rtol=1e-6)


def test_sequence_conv_zero_is_identity():
    sim = np.arange(12.0).reshape(3, 4)
    np.testing.assert_array_equal(np.asarray(sequence_conv(sim, 0)), sim)


@pytest.mark.parametrize("L", [1, 2, 3, 4, 5, 6, 8, 10])
def test_online_sequence_conv_matches_scipy(L):
    # L > the 4-query block width is the regression case: kernel taps shift
    # entirely off the block ('same' mode keeps the output shape), and the
    # old slice arithmetic wrapped a negative stop into a bogus slice.
    rng = np.random.default_rng(1)
    block = rng.random((4, 25))  # (queries, places), run_speck.py:200
    expected = (
        scipy_signal.convolve2d(block.T, np.eye(L, dtype=np.float32), mode="same") / L
    )
    got = online_sequence_conv(block, L)
    np.testing.assert_allclose(got, expected, rtol=1e-5)
