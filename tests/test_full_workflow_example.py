"""The examples/full_workflow.py user journey, smallest viable sizes."""

import importlib.util
import os


def test_full_workflow(tmp_path):
    spec = importlib.util.spec_from_file_location(
        "wf",
        os.path.join(os.path.dirname(__file__), "..", "examples", "full_workflow.py"),
    )
    wf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(wf)
    rc = wf.main(
        [
            "--places", "6",
            "--events_per_bin", "5000",
            "--workdir", str(tmp_path),
        ]
    )
    assert rc == 0
    # Every stage left its artifacts behind.
    assert os.path.isdir(tmp_path / "dataset" / "synth" / "dvs" / "ref-trav")
    assert os.path.isdir(tmp_path / "dataset" / "synth" / "dvs" / "qry-trav")
    models = os.listdir(tmp_path / "models")
    assert any(m.endswith(".npz") for m in models)
    runs = sorted(os.listdir(tmp_path / "output"))
    assert runs  # inference + streaming run folders
