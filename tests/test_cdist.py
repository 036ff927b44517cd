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


def test_run_sad_respects_filter_and_caps(tmp_path):
    """SAD must evaluate the same image subset as the LENS pipeline: with an
    oversized folder (or --filter > 1) the reference loads every PNG and its
    matrix cannot match the GT — here the skip/cap selection applies."""
    from PIL import Image

    from lens_tpu.metrics.gt import make_gt_tolerant
    from lens_tpu.sad import run_sad

    rng = np.random.default_rng(0)
    n_imgs, n_keep, roi = 12, 5, 8
    for sub in ("ref", "qry"):
        d = tmp_path / sub
        d.mkdir()
        for i in range(n_imgs):  # oversized folders: 12 PNGs, 5 places used
            Image.fromarray(
                rng.integers(0, 255, (roi, roi), dtype=np.uint8)
            ).save(d / f"images_{i:05d}.png")
    GT = make_gt_tolerant(np.eye(n_keep), 2, 1)
    pr, rec = run_sad(
        str(tmp_path / "ref"), str(tmp_path / "qry"), GT, str(tmp_path), 2,
        skip=1, n_ref=n_keep, n_query=n_keep,
    )
    assert len(rec) == 6 and all(0.0 <= r <= 1.0 for r in rec)
