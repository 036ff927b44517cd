import numpy as np

from lens_tpu.ops.cdist import l1_cdist


def test_l1_cdist_matches_numpy():
    rng = np.random.default_rng(0)
    a = rng.random((13, 40)).astype(np.float32)
    b = rng.random((9, 40)).astype(np.float32)
    got = np.asarray(l1_cdist(a, b, chunk=4))
    expected = np.abs(a[:, None, :] - b[None, :, :]).sum(-1)
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_l1_cdist_chunk_padding():
    rng = np.random.default_rng(1)
    a = rng.random((5, 8)).astype(np.float32)  # 5 % 4 != 0
    b = rng.random((3, 8)).astype(np.float32)
    got = np.asarray(l1_cdist(a, b, chunk=4))
    assert got.shape == (5, 3)
    expected = np.abs(a[:, None, :] - b[None, :, :]).sum(-1)
    np.testing.assert_allclose(got, expected, rtol=1e-5)
