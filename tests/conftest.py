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

import pytest  # noqa: E402

REFERENCE = os.path.join(os.path.dirname(__file__), "..", "lens")


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
