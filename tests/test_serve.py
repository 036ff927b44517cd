"""Serving endpoint: health, match, stats over a real socket."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from lens_tpu.core.network import params_from_numpy
from lens_tpu.models.lens import LensModel
from lens_tpu.runtime.serve import serve


@pytest.fixture(scope="module")
def server(tiny_dataset_cfg):
    rng = np.random.default_rng(0)
    cfg = tiny_dataset_cfg
    params = params_from_numpy(
        np.abs(rng.normal(0, 0.3, (cfg.input, cfg.feature))).astype(np.float32),
        np.abs(rng.normal(0, 0.3, (cfg.feature, cfg.output))).astype(np.float32),
        np.zeros(cfg.feature, np.float32),
        np.zeros(cfg.output, np.float32),
    )
    srv, host = serve(cfg, port=0, model=LensModel.from_params(cfg, params))
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv, host, srv.server_address[1]
    srv.shutdown()


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
        return json.loads(r.read())


def test_healthz(server):
    _, _, port = server
    h = _get(port, "/healthz")
    assert h["status"] == "ok"
    assert "LENS" in h["model"]


def test_match_roundtrip(server, tiny_dataset_cfg):
    _, _, port = server
    cfg = tiny_dataset_cfg
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (2, cfg.roi_dim, cfg.roi_dim), np.uint8)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/match",
        data=frames.tobytes(),
        headers={"X-Frame-Count": "2", "X-Roi-Dim": str(cfg.roi_dim)},
    )
    with urllib.request.urlopen(req) as r:
        out = json.loads(r.read())
    assert len(out["matches"]) == 2
    assert all(0 <= m < cfg.output for m in out["matches"])
    assert out["latency_ms"] > 0
    stats = _get(port, "/stats")
    assert stats["requests"] >= 1 and "p50_ms" in stats


def test_match_size_validation(server, tiny_dataset_cfg):
    _, _, port = server
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/match", data=b"123",
        headers={"X-Frame-Count": "1"},
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req)
    assert exc.value.code == 400
