"""Live dashboard (samnagui equivalent): server, state, and --headless gating."""

import json
import urllib.request
from dataclasses import replace

import numpy as np

from lens_tpu.runtime.visualize import LiveDashboard


def _get(url: str):
    with urllib.request.urlopen(url, timeout=5) as r:
        return r.status, r.read()


def test_dashboard_serves_page_and_state():
    dash = LiveDashboard()
    url = dash.start(port=0)
    try:
        rng = np.random.default_rng(0)
        for i in range(3):
            dash.update_bin(
                i,
                rng.integers(0, 20, (80, 80)),
                out_spikes=10 * (i + 1),
                rails_w={"io": 1e-3, "ram": 2e-3, "logic": 3e-3, "vddd": 1e-4, "vdda": 6e-4},
            )
        dash.add_matches([4, 7])

        status, body = _get(url)
        assert status == 200
        assert b"DVS activity" in body and b"Power" in body and b"matches" in body

        status, body = _get(url + "state")
        assert status == 200
        state = json.loads(body)
        assert state["bin"] == 2
        assert state["bin_spikes"] == 30
        assert state["total_spikes"] == 60
        assert state["matches"] == [4, 7]
        # all five rails present with per-bin history, in mW
        assert set(state["rails_mw"]) == {"io", "ram", "logic", "vddd", "vdda"}
        assert len(state["rails_mw"]["logic"]) == 3
        assert abs(state["rails_mw"]["logic"][-1] - 3.0) < 1e-9
        # activity frame decodes as a PNG
        import base64
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(base64.b64decode(state["frame_png"])))
        assert img.size == (80, 80)
    finally:
        dash.stop()


def test_headless_flag_gates_dashboard(tiny_dataset_cfg, tiny_model_for_viz):
    """--headless must actually disable the live view (round-1: it gated
    nothing); without it the streaming mode exposes a live URL."""
    from lens_tpu.runtime.stream import run_event_driven

    m_headless = run_event_driven(replace(tiny_dataset_cfg, event_driven=True, headless=True))
    assert m_headless.dashboard_url is None

    m_live = run_event_driven(replace(tiny_dataset_cfg, event_driven=True))
    assert m_live.dashboard_url is not None
    assert m_live.dashboard_url.startswith("http://127.0.0.1:")


import os

import pytest


@pytest.fixture(scope="module")
def tiny_model_for_viz(tiny_dataset_cfg):
    from dataclasses import replace as _replace

    from lens_tpu.train_model import run_training

    path = os.path.join(
        tiny_dataset_cfg.models_dir, tiny_dataset_cfg.model_name(".npz")
    )
    if not os.path.exists(path):
        run_training(_replace(tiny_dataset_cfg, train_model=True))
    return path
