import numpy as np
import pytest

from lens_tpu.data.dataset import (
    FrameDataset,
    center_pixel_flat_indices,
    center_pixel_indices,
    gamma_correct,
)


def test_center_pixel_indices_match_reference_conv():
    # k=8 kernel, centre (k//2 - 1)=3: output[i,j] = input[8i+3, 8j+3]
    rows, cols = center_pixel_indices(80, 10)
    np.testing.assert_array_equal(rows, 3 + 8 * np.arange(10))
    flat = center_pixel_flat_indices(80, 10)
    assert flat.shape == (100,)
    assert flat[0] == 3 * 80 + 3


def test_center_pixel_against_torch_conv():
    torch = pytest.importorskip("torch")
    # Rebuild the reference conv (run_model.py:129-137) and compare outputs.
    k = 8
    kernel = torch.zeros(1, 1, k, k)
    kernel[0, 0, k // 2 - 1, k // 2 - 1] = 1
    conv = torch.nn.Conv2d(1, 1, kernel_size=k, stride=k, padding=0, bias=False)
    conv.weight = torch.nn.Parameter(kernel, requires_grad=False)
    img = torch.rand(1, 1, 80, 80)
    expected = conv(img).detach().numpy().reshape(10, 10)
    rows, cols = center_pixel_indices(80, 10)
    got = img.numpy()[0, 0][rows][:, cols]
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_gamma_correct_pulls_mean_toward_gray():
    img = np.full((10, 10), 50.0)  # dark image
    out = gamma_correct(img)
    assert abs(out.mean() - 127.5) < 1.0


def test_gamma_correct_guards():
    assert gamma_correct(np.zeros((4, 4))).sum() == 0  # mean 0: skip
    one = np.ones((4, 4))
    np.testing.assert_array_equal(gamma_correct(one), one)  # mean 1: log(1)=0 skip


def test_load_example_dataset(example_paths):
    ds = FrameDataset.load(
        example_paths["query_csv"], example_paths["query_dir"], max_samples=10
    )
    assert len(ds) == 10
    assert ds.frames.shape == (10, 80, 80)
    assert ds.labels[0] == 0
    q = ds.query_intensities()
    assert q.shape == (10, 6400) and q.max() <= 1.0
    qd = ds.query_intensities_downsampled(10)
    assert qd.shape == (10, 100)
    t = ds.train_intensities(10)
    assert t.shape == (10, 100) and 0.0 <= t.min() and t.max() <= 1.0


def test_skip_filter(example_paths):
    ds = FrameDataset.load(
        example_paths["query_csv"], example_paths["query_dir"], skip=2, max_samples=5
    )
    np.testing.assert_array_equal(ds.labels, [0, 2, 4, 6, 8])
