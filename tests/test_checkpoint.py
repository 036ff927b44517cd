import numpy as np
import pytest

from lens_tpu.config import LensConfig
from lens_tpu.core.network import params_from_numpy
from lens_tpu.utils import checkpoint


@pytest.fixture
def params():
    rng = np.random.default_rng(0)
    return params_from_numpy(
        rng.normal(size=(100, 200)).astype(np.float32),
        rng.normal(size=(200, 100)).astype(np.float32),
        rng.random(200).astype(np.float32),
        rng.random(100).astype(np.float32),
    )


def test_npz_roundtrip(tmp_path, params):
    p = str(tmp_path / "m.npz")
    checkpoint.save_npz(p, params, config_json="{}")
    loaded = checkpoint.load_npz(p)
    np.testing.assert_array_equal(np.asarray(loaded.w_feat), np.asarray(params.w_feat))
    np.testing.assert_array_equal(np.asarray(loaded.thr_out), np.asarray(params.thr_out))


def test_pth_roundtrip(tmp_path, params):
    torch = pytest.importorskip("torch")
    p = str(tmp_path / "m.pth")
    checkpoint.save_pth(p, params)
    # Layout written for the reference loader: (out, in) weights, (1, n) thr.
    sd = torch.load(p, weights_only=True)
    assert tuple(sd["feature_layer.w.weight"].shape) == (200, 100)
    assert tuple(sd["feature_layer.thr"].shape) == (1, 200)
    loaded = checkpoint.load_pth(p)
    np.testing.assert_allclose(
        np.asarray(loaded.w_out), np.asarray(params.w_out), rtol=1e-6
    )


def test_load_bundled_reference_checkpoint(example_paths):
    params = checkpoint.load_pth(example_paths["model"])
    assert params.w_feat.shape == (100, 200)
    assert params.w_out.shape == (200, 100)
    assert params.thr_feat.shape == (200,)


def test_save_model_prefers_npz(tmp_path, params):
    cfg = LensConfig()
    name = cfg.model_name()
    assert name == "example-reference_LENS_IN100_FN200_DB100.pth"
    checkpoint.save_model(str(tmp_path), name, params, cfg.to_json())
    loaded = checkpoint.load_model(str(tmp_path), name)
    np.testing.assert_array_equal(np.asarray(loaded.w_feat), np.asarray(params.w_feat))
    # config sidecar written
    assert (tmp_path / "example-reference_LENS_IN100_FN200_DB100.config.json").exists()


def test_orbax_roundtrip(tmp_path, params):
    pytest.importorskip("orbax.checkpoint")
    path = str(tmp_path / "ockpt")
    assert checkpoint.save_orbax(path, params)
    loaded = checkpoint.load_orbax(path)
    np.testing.assert_array_equal(np.asarray(loaded.w_out), np.asarray(params.w_out))


def test_parse_model_name():
    meta = checkpoint.parse_model_name("sunset2_LENS_IN49_FN63_DB641.pth")
    assert meta == {"input": 49, "feature": 63, "places": 641}


def test_load_model_rejects_nonfinite_checkpoint(tmp_path):
    """A NaN/inf checkpoint (diverged external run) must be refused at load,
    not silently evaluated into meaningless similarity matrices."""
    from lens_tpu.core.network import params_from_numpy
    from lens_tpu.utils.checkpoint import load_model, save_npz

    w1 = np.ones((4, 8), np.float32)
    w1[0, 0] = np.nan
    p = params_from_numpy(
        w1, np.ones((8, 3), np.float32),
        np.zeros(8, np.float32), np.zeros(3, np.float32),
    )
    save_npz(str(tmp_path / "bad_LENS_IN4_FN8_DB3.npz"), p, "{}")
    with pytest.raises(ValueError, match="NaN"):
        load_model(str(tmp_path), "bad_LENS_IN4_FN8_DB3.pth")
