"""Interop: models trained here must load into the reference's torch layout
and produce identical linear responses (the contract run_model.py:353-358
relies on when loading `.pth` checkpoints into `nn.Linear` weights)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_saved_pth_drives_torch_linear_identically(tmp_path):
    import jax

    from lens_tpu.core.network import params_from_numpy
    from lens_tpu.utils.checkpoint import save_pth

    rng = np.random.default_rng(0)
    params = params_from_numpy(
        rng.normal(0, 0.3, (100, 200)).astype(np.float32),
        rng.normal(0, 0.3, (200, 100)).astype(np.float32),
        rng.random(200).astype(np.float32),
        rng.random(100).astype(np.float32),
    )
    path = str(tmp_path / "m.pth")
    save_pth(path, params)

    # Reconstruct the reference's inference module shape: Linear(in, out,
    # bias=False) fed from the state dict (blitnet.py:59-64).
    sd = torch.load(path, weights_only=True)
    feat = torch.nn.Linear(100, 200, bias=False)
    out = torch.nn.Linear(200, 100, bias=False)
    feat.weight = torch.nn.Parameter(sd["feature_layer.w.weight"])
    out.weight = torch.nn.Parameter(sd["output_layer.w.weight"])

    x = torch.rand(7, 100)
    with torch.no_grad():
        torch_h = feat(x).numpy()
        torch_y = out(torch.relu(feat(x))).numpy()

    import jax.numpy as jnp

    jax_h = np.asarray(jnp.asarray(x.numpy()) @ params.w_feat)
    jax_y = np.asarray(
        jnp.maximum(jnp.asarray(x.numpy()) @ params.w_feat, 0.0) @ params.w_out
    )
    np.testing.assert_allclose(jax_h, torch_h, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(jax_y, torch_y, rtol=1e-5, atol=1e-5)


def test_reference_checkpoint_thresholds_shape(example_paths):
    """The bundled reference checkpoint's thr tensors keep their (1, n)
    layout through our converter (state-dict contract)."""
    sd = torch.load(example_paths["model"], weights_only=True)
    assert tuple(sd["feature_layer.thr"].shape) == (1, 200)
    assert tuple(sd["output_layer.thr"].shape) == (1, 100)
