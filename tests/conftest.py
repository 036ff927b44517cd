import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (see SURVEY.md §2 parallelism checklist).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

from lens_tpu.utils.jaxsetup import force_cpu, setup_jax  # noqa: E402

# The axon sitecustomize ignores JAX_PLATFORMS, so force CPU via config too.
force_cpu(min_devices=8)
setup_jax()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = os.path.join(os.path.dirname(__file__), "..", "lens")


@pytest.fixture(scope="session")
def tiny_dataset_cfg(tmp_path_factory):
    """8 reference + 8 query places, 16x16 ROI, distinctive blobs — a
    complete miniature dataset for fast end-to-end mode tests."""
    from PIL import Image

    from lens_tpu.config import LensConfig

    root = tmp_path_factory.mktemp("tiny")
    data_dir = root / "dataset"
    base = data_dir / "tinyset" / "cam"
    rng = np.random.default_rng(0)
    n, roi = 8, 16
    frames = (rng.random((n, roi, roi)) * 80).astype(np.uint8)
    for i in range(n):
        frames[i, (i * 2) % roi : (i * 2) % roi + 3, :] = 220  # place signature

    for name, jitter in (("ref-trav", 0), ("qry-trav", 3)):
        d = base / name
        d.mkdir(parents=True)
        rows = ["Image_name,index"]
        for i in range(n):
            img = np.clip(frames[i].astype(int) + jitter, 0, 255).astype(np.uint8)
            Image.fromarray(img).save(d / f"img_{i:03d}.png")
            rows.append(f"img_{i:03d}.png,{i}")
        (data_dir / f"{name}.csv").write_text("\n".join(rows) + "\n")
    np.save(base / "ref-trav_qry-trav_GT.npy", np.eye(n, dtype=int))

    return LensConfig(
        dataset="tinyset",
        camera="cam",
        reference="ref-trav",
        query="qry-trav",
        data_dir=str(data_dir) + os.sep,
        reference_places=n,
        query_places=n,
        sequence_length=2,
        GT_tolerance=1,
        timebin=20,
        dims=4,
        roi_dim=16,
        epoch_feat=4,
        epoch_out=4,
        matching=True,
        models_dir=str(root / "models"),
        output_base=str(root / "output"),
        raster_mode="jax",
    )


@pytest.fixture(scope="session")
def example_paths():
    base = os.path.abspath(REFERENCE)
    return {
        "query_csv": os.path.join(base, "dataset", "example-query.csv"),
        "reference_csv": os.path.join(base, "dataset", "example-reference.csv"),
        "query_dir": os.path.join(base, "dataset", "example", "davis128", "example-query"),
        "reference_dir": os.path.join(
            base, "dataset", "example", "davis128", "example-reference"
        ),
        "gt": os.path.join(
            base,
            "dataset",
            "example",
            "davis128",
            "example-reference_example-query_GT.npy",
        ),
        "model": os.path.join(
            base, "models", "example-reference_LENS_IN100_FN200_DB100.pth"
        ),
    }
