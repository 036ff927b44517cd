"""Fleet serving demo: N simulated robots stream frames to one model host.

Starts the HTTP serving endpoint in-process, opens one stateful streaming
session per robot (persistent membranes, chip semantics), and drives them
concurrently — the host micro-batches simultaneous bins into single device
programs (watch `stream_dispatches` vs `stream_bins` in /stats).

    python examples/fleet_client.py [--robots 4] [--bins 6]

Runs anywhere (CPU included); no hardware or dataset needed beyond the
bundled example checkpoint.
"""

import argparse
import json
import os
import sys
import threading
import urllib.request

import numpy as np

# Runnable as `python examples/fleet_client.py` from a source checkout
# (sys.path[0] is examples/, not the repo root where lens_tpu lives).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--robots", type=int, default=4)
    ap.add_argument("--bins", type=int, default=6)
    args = ap.parse_args()

    from lens_tpu.config import LensConfig
    from lens_tpu.runtime.serve import serve

    cfg = LensConfig()
    srv, host = serve(cfg, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    print(f"model host up on :{port} ({cfg.model_name()})")

    def post(path, body=b"", headers=None):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", data=body, headers=headers or {}
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            return json.loads(r.read())

    def get(path):
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=60) as r:
            return json.loads(r.read())

    rng = np.random.default_rng(0)
    sids = [post("/stream/open")["session"] for _ in range(args.robots)]
    frames = rng.integers(
        0, 255, (args.robots, args.bins, cfg.roi_dim, cfg.roi_dim)
    ).astype(np.uint8)

    barrier = threading.Barrier(args.robots)
    results = [[None] * args.bins for _ in range(args.robots)]

    def robot(i):
        for b in range(args.bins):
            barrier.wait()  # all robots' bins land simultaneously
            results[i][b] = post(
                "/stream/bin", frames[i, b].tobytes(), {"X-Session": sids[i]}
            )

    threads = [threading.Thread(target=robot, args=(i,)) for i in range(args.robots)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    for i in range(args.robots):
        places = [r["top_place"] for r in results[i]]
        lat = [r["latency_ms"] for r in results[i]]
        print(f"robot {i}: places {places}  p50 {np.percentile(lat, 50):.1f} ms")
    stats = get("/stats")
    print(
        f"{stats['stream_bins']} bins served in {stats['stream_dispatches']} "
        f"device programs (micro-batching ratio "
        f"{stats['stream_bins'] / max(stats['stream_dispatches'], 1):.1f}x)"
    )
    for sid in sids:
        post("/stream/close", headers={"X-Session": sid})
    srv.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
