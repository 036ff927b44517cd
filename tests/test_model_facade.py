import numpy as np

from lens_tpu.config import LensConfig
from lens_tpu.models.lens import LensModel
from lens_tpu.utils.checkpoint import load_pth


def test_facade_spike_counts_matches_pipeline(example_paths):
    cfg = LensConfig()
    model = LensModel.from_params(cfg, load_pth(example_paths["model"]))
    from lens_tpu.data.dataset import FrameDataset

    ds = FrameDataset.load(
        example_paths["query_csv"], example_paths["query_dir"], max_samples=10
    )
    counts = model.spike_counts(ds.query_intensities_downsampled(10))
    assert counts.shape == (10, 100)
    assert counts.sum() > 0


def test_facade_quantized_deterministic(example_paths):
    cfg = LensConfig(timebin=20)
    model = LensModel.from_params(cfg, load_pth(example_paths["model"]))
    q = model.quantized()
    intens = np.random.default_rng(0).random((4, 100)).astype(np.float32)
    a = q.spike_counts(intens)
    b = q.spike_counts(intens)
    np.testing.assert_array_equal(a, b)


def test_facade_chip_thresholds(example_paths):
    cfg = LensConfig(timebin=20)
    model = LensModel.from_params(cfg, load_pth(example_paths["model"]))
    chip = model.with_chip_thresholds()
    assert chip.spike_thresholds.feat == 10.0 and chip.spike_thresholds.out == 2.0
    intens = np.full((2, 100), 0.9, np.float32)
    # Higher thresholds => no more spikes than the default model.
    assert chip.spike_counts(intens).sum() <= model.spike_counts(intens).sum()


def test_facade_save_roundtrip(example_paths, tmp_path):
    cfg = LensConfig(models_dir=str(tmp_path))
    model = LensModel.from_params(cfg, load_pth(example_paths["model"]))
    model.save()
    loaded = LensModel.from_checkpoint(cfg)
    np.testing.assert_array_equal(
        np.asarray(loaded.params.w_feat), np.asarray(model.params.w_feat)
    )


def test_facade_bf16_precision(tiny_dataset_cfg):
    """LensModel.spike_counts(precision='bf16') mirrors the CLI route:
    counts track f32 up to the bf16 weight rounding."""
    from lens_tpu.core.network import params_from_numpy
    from lens_tpu.models.lens import LensModel

    cfg = tiny_dataset_cfg
    rng = np.random.default_rng(3)
    m = LensModel.from_params(
        cfg,
        params_from_numpy(
            rng.normal(0, 0.3, (cfg.input, cfg.feature)).astype(np.float32),
            rng.normal(0, 0.3, (cfg.feature, cfg.output)).astype(np.float32),
            np.zeros(cfg.feature, np.float32),
            np.zeros(cfg.output, np.float32),
        ),
    )
    intens = rng.random((5, cfg.input)).astype(np.float32)
    f32 = m.spike_counts(intens)
    bf16 = m.spike_counts(intens, precision="bf16")
    assert bf16.shape == f32.shape
    assert (np.abs(bf16 - f32) <= 3).all()
