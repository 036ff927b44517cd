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


def _post(port, path, body=b"", headers=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body, headers=headers or {}
    )
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def test_stream_session_carries_membranes(server, tiny_dataset_cfg):
    """The /stream API is STATEFUL: membranes persist across a session's
    bins (chip semantics).  Two bins through a session must equal the
    direct carry computation, and a fresh session must differ from a
    carried second bin whenever the carry matters."""
    _, host, port = server
    cfg = tiny_dataset_cfg
    rng = np.random.default_rng(7)
    frame = rng.integers(0, 255, (cfg.roi_dim, cfg.roi_dim)).astype(np.uint8)

    s = _post(port, "/stream/open", json.dumps({"thresholds": "unit"}).encode())
    sid = s["session"]
    r1 = _post(port, "/stream/bin", frame.tobytes(), {"X-Session": sid})
    r2 = _post(port, "/stream/bin", frame.tobytes(), {"X-Session": sid})
    assert r1["bin"] == 0 and r2["bin"] == 1
    assert len(r1["counts"]) == cfg.output

    # Direct computation with the same qparams + carry must agree exactly.
    import jax.numpy as jnp

    from lens_tpu.core.network import SpikeThresholds
    from lens_tpu.data.dataset import center_pixel_indices
    from lens_tpu.runtime.speck_sim import discretize
    from lens_tpu.runtime.stream import (
        even_spread_raster,
        stream_forward_counts_carry,
    )

    qp = discretize(host.model.params, SpikeThresholds(), cfg.min_v_mem)
    rows, cols = center_pixel_indices(cfg.roi_dim, cfg.dims)
    down = frame[rows][:, cols].astype(np.int64).reshape(-1)
    raster = jnp.asarray(even_spread_raster(down, int(min(max(cfg.timebin, 1), 1000))))
    v2 = jnp.zeros((qp.w_feat.shape[1],), jnp.int32)
    v3 = jnp.zeros((qp.w_out.shape[1],), jnp.int32)
    c1, v2, v3, _ = stream_forward_counts_carry(qp, raster, v2, v3)
    c2, v2, v3, _ = stream_forward_counts_carry(qp, raster, v2, v3)
    assert r1["counts"] == np.asarray(c1).astype(int).tolist()
    assert r2["counts"] == np.asarray(c2).astype(int).tolist()

    out = _post(port, "/stream/close", headers={"X-Session": sid})
    assert out == {"closed": True, "bins": 2}
    # Closed session is gone.
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(port, "/stream/bin", frame.tobytes(), {"X-Session": sid})
    assert e.value.code == 404


def test_stream_open_default_is_chip_thresholds(server):
    _, _, port = server
    s = _post(port, "/stream/open")
    assert s["thresholds"] == "chip"
    _post(port, "/stream/close", headers={"X-Session": s["session"]})


def test_stream_session_table_is_bounded(server):
    """Opening sessions without closing must evict the stalest instead of
    growing host memory without bound."""
    _, host, port = server
    prev = host.max_sessions
    host.max_sessions = 4
    sids = [_post(port, "/stream/open")["session"] for _ in range(6)]
    assert len(host._sessions) == 4
    # The two stalest (first-opened, never used) sessions were evicted.
    assert sids[0] not in host._sessions and sids[1] not in host._sessions
    assert sids[-1] in host._sessions
    for sid in sids[2:]:
        _post(port, "/stream/close", headers={"X-Session": sid})
    host.max_sessions = prev  # module-scoped host: don't poison later tests


def test_concurrent_sessions_micro_batch_correctly(server, tiny_dataset_cfg):
    """Fleet load: N concurrent sessions advance bins simultaneously; the
    batcher must (a) produce the SAME counts each session would get alone
    (bit-exact vs a serial reference run), (b) keep every session's carry
    ordered, and (c) actually batch (fewer dispatches than bins)."""
    _, host, port = server
    cfg = tiny_dataset_cfg
    n_sessions, n_bins = 6, 3
    rng = np.random.default_rng(9)
    frames = rng.integers(
        0, 255, (n_sessions, n_bins, cfg.roi_dim, cfg.roi_dim)
    ).astype(np.uint8)

    assert host.max_sessions >= n_sessions  # all sessions must stay live
    d0 = host._batcher.dispatches if host._batcher else 0
    sids = [
        _post(port, "/stream/open", json.dumps({"thresholds": "unit"}).encode())[
            "session"
        ]
        for _ in range(n_sessions)
    ]

    results = [[None] * n_bins for _ in range(n_sessions)]
    barrier = threading.Barrier(n_sessions)

    def client(s):
        for b in range(n_bins):
            barrier.wait()  # all sessions hit the host at once
            results[s][b] = _post(
                port, "/stream/bin", frames[s, b].tobytes(), {"X-Session": sids[s]}
            )

    threads = [threading.Thread(target=client, args=(s,)) for s in range(n_sessions)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    # (b) carry ordering: bin indices are 0..n_bins-1 per session.
    for s in range(n_sessions):
        assert [r["bin"] for r in results[s]] == list(range(n_bins))

    # (a) bit-exact vs the serial single-stream computation.
    import jax.numpy as jnp

    from lens_tpu.core.network import SpikeThresholds
    from lens_tpu.data.dataset import center_pixel_indices
    from lens_tpu.runtime.speck_sim import discretize
    from lens_tpu.runtime.stream import (
        even_spread_raster,
        stream_forward_counts_carry,
        substeps_for,
    )

    qp = discretize(host.model.params, SpikeThresholds(), cfg.min_v_mem)
    rows, cols = center_pixel_indices(cfg.roi_dim, cfg.dims)
    steps = substeps_for(cfg.timebin)
    for s in range(n_sessions):
        vf = jnp.zeros((qp.w_feat.shape[1],), jnp.int32)
        vo = jnp.zeros((qp.w_out.shape[1],), jnp.int32)
        for b in range(n_bins):
            down = frames[s, b][rows][:, cols].astype(np.int64).reshape(-1)
            c, vf, vo, _ = stream_forward_counts_carry(
                qp, jnp.asarray(even_spread_raster(down, steps)), vf, vo
            )
            assert results[s][b]["counts"] == np.asarray(c).astype(int).tolist()

    # (c) batching happened: strictly fewer device programs than bins served.
    stats = _get(port, "/stats")
    served = stats["stream_bins"]
    dispatched = stats["stream_dispatches"] - d0
    assert served >= n_sessions * n_bins
    assert dispatched < n_sessions * n_bins

    for sid in sids:
        _post(port, "/stream/close", headers={"X-Session": sid})


def test_deferred_item_survives_wave_failure(monkeypatch):
    """A second bin from the same session defers (re-queues) to the next
    wave; if the current wave then fails, the deferred item must NOT be
    marked failed — it is still in the queue and gets served later (failing
    it would 500 the client while the worker integrates the bin anyway,
    double-counting it into the session carry after a retry)."""
    import threading
    from types import SimpleNamespace

    from lens_tpu.runtime.serve import _BinBatcher

    calls = []

    def fake_dispatch(self, batch):
        calls.append(list(batch))
        if len(calls) == 1:
            raise RuntimeError("boom")
        for it in batch:
            it["out"] = ("served", len(calls))
            it["done"].set()

    monkeypatch.setattr(_BinBatcher, "_dispatch", fake_dispatch)
    host = SimpleNamespace(_sessions={"a": 1, "b": 2}, _lock=threading.Lock())
    batcher = _BinBatcher(host, window_s=0.3)  # wide window: both bins join wave 1
    sess = {"id": "s1"}
    results = []

    def submit():
        try:
            results.append(("ok", batcher.run(sess, np.zeros(4, np.int32))))
        except Exception as e:  # noqa: BLE001
            results.append(("err", e))

    threads = [threading.Thread(target=submit) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    kinds = sorted(k for k, _ in results)
    # Exactly one request fails with the wave error; the deferred one is
    # served on a later wave.
    assert kinds == ["err", "ok"], results
    assert len(calls) >= 2
    served = [v for k, v in results if k == "ok"][0]
    assert served[0] == "served" and served[1] >= 2


def test_match_roi_mismatch_is_400(server, tiny_dataset_cfg):
    """A client X-Roi-Dim that differs from the host's geometry is a
    validation error: the host's center-pixel selection is computed for its
    own roi_dim, and applying it to a different layout would silently select
    wrong pixels (or IndexError as a 500)."""
    import urllib.error

    _, _, port = server
    roi = tiny_dataset_cfg.roi_dim + 8
    body = np.zeros(roi * roi, np.uint8).tobytes()
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(port, "/match", body, {"X-Frame-Count": "1", "X-Roi-Dim": str(roi)})
    assert e.value.code == 400


def test_oversized_body_is_413_before_buffering(server):
    """A huge client-declared Content-Length must be refused before the
    body is read into memory (the endpoint binds all interfaces)."""
    import http.client

    _, _, port = server
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    conn.putrequest("POST", "/match")
    conn.putheader("Content-Length", str(10 * 1024 * 1024 * 1024))  # 10 GB
    conn.putheader("X-Frame-Count", "1")
    conn.endheaders()
    # Server must answer from the headers alone — send nothing further.
    resp = conn.getresponse()
    assert resp.status == 413
    conn.close()


def test_stream_open_nondict_json_is_400(server):
    """A valid-JSON non-object body (a plausible client mistake) is a 400
    validation error, not a 500 AttributeError."""
    import urllib.error

    _, _, port = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(port, "/stream/open", b'"chip"')
    assert e.value.code == 400


def test_match_events_roundtrip(server, tiny_dataset_cfg):
    """AER-sparse endpoint: packed uint32 words in, per-bin matches out —
    equal to the local aer_counts_forward on the same words (incl. sentinel
    padding), with range validation."""
    import jax.numpy as jnp
    import urllib.error

    from lens_tpu.core.network import SpikeThresholds
    from lens_tpu.ops.events_device import (
        PACKED_SENTINEL,
        aer_counts_forward,
        pack_center_events,
    )
    from lens_tpu.runtime.speck_sim import discretize
    from lens_tpu.runtime.stream import substeps_for

    _, host, port = server
    cfg = tiny_dataset_cfg
    rng = np.random.default_rng(5)
    n_bins, n_ev = 3, 60
    bins = rng.integers(0, n_bins, n_ev)
    pix = rng.integers(0, cfg.input, n_ev)
    packed = pack_center_events(bins, pix, cfg.input)
    packed = np.concatenate([packed, np.full(4, PACKED_SENTINEL, np.uint32)])

    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/match_events",
        data=packed.tobytes(),
        headers={"X-Bin-Count": str(n_bins)},
    )
    with urllib.request.urlopen(req) as r:
        out = json.loads(r.read())
    assert len(out["matches"]) == n_bins

    qp = discretize(host.model.params, SpikeThresholds(), cfg.min_v_mem)
    ref = np.asarray(
        aer_counts_forward(
            qp, jnp.asarray(packed), n_bins, cfg.input,
            substeps_for(cfg.timebin),
        )
    )
    np.testing.assert_array_equal(np.asarray(out["counts"]), ref)

    # Out-of-range words are a 400, not silent corruption.
    bad = np.array([n_bins * cfg.input + 5], np.uint32)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/match_events",
        data=bad.tobytes(),
        headers={"X-Bin-Count": str(n_bins)},
    )
    try:
        urllib.request.urlopen(req)
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_match_events_word_axis_bucketed(server, tiny_dataset_cfg, monkeypatch):
    """Distinct request-body LENGTHS inside one power-of-two bucket must
    reach the device program with ONE padded word shape (sentinel-padded on
    the host), bounding XLA compiles to ~26 bucket pairs instead of one per
    body size — an unauthenticated client must not be able to force a fresh
    compile under the device lock per request (ADVICE r4)."""
    import lens_tpu.ops.events_device as ed
    from lens_tpu.ops.events_device import pack_center_events

    _, host, port = server
    cfg = tiny_dataset_cfg
    seen_shapes = []
    real_fwd = ed.aer_counts_forward

    def recording_fwd(qp, packed, *a, **kw):
        seen_shapes.append(int(packed.shape[0]))
        return real_fwd(qp, packed, *a, **kw)

    monkeypatch.setattr(ed, "aer_counts_forward", recording_fwd)
    rng = np.random.default_rng(7)
    outs = []
    for n_ev in (5, 7, 8):  # all in the 8-word bucket
        bins = rng.integers(0, 2, n_ev)
        pix = rng.integers(0, cfg.input, n_ev)
        packed = pack_center_events(bins, pix, cfg.input)
        outs.append(host.match_events(packed, 2))
    assert seen_shapes == [8, 8, 8]
    for out in outs:
        assert len(out["matches"]) == 2

    # The empty body (0 words) must also pad (to 1), not trace an N=0 shape.
    seen_shapes.clear()
    out = host.match_events(np.empty(0, np.uint32), 2)
    assert seen_shapes == [1]
    assert np.asarray(out["counts"]).sum() == 0


def test_match_events_bin_count_bounded(server):
    """An absurd X-Bin-Count is a 400, not an allocation (the DoS posture
    of MAX_BODY_BYTES applied to the shape)."""
    import urllib.error

    _, _, port = server
    word = np.zeros(1, np.uint32)
    for bad_bins in ("2000000000", "0", "-3"):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/match_events",
            data=word.tobytes(),
            headers={"X-Bin-Count": bad_bins},
        )
        try:
            urllib.request.urlopen(req)
            assert False, f"expected HTTP 400 for X-Bin-Count={bad_bins}"
        except urllib.error.HTTPError as e:
            assert e.code == 400
