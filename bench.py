"""End-to-end benchmark suite (the BASELINE.json north star + context rows).

Sections (all folded into ONE printed JSON line):
  headline  event-frames/sec for the full query pipeline on the bundled toy
            model (IN100/FN200/DB100, T=250) — the tracked metric — plus the
            efficiency context: analytic FLOPs/frame, achieved GFLOP/s, MFU
            vs the chip's bf16 matmul peak, and the achieved VMEM traffic of
            the kernel's own bottleneck model (BENCHMARKS.md: the fused
            kernel is VMEM-bandwidth bound, not MXU bound).
  uint8     raw-uint8-frames-from-host variant (SURVEY §7 shape), reported
            WITH its transport caveat fields: in this container h2d crosses
            a ~50 MB/s tunnel, so the number is a transfer ceiling, not a
            chip limit (PCIe convergence estimate included).
  sunset    the second bundled model scale (IN49/FN63/DB641, T=1000).
  stream    single-stream --event_driven real-time margin: sustained
            bins/s end-to-end (parse -> event-time raster -> dispatch ->
            matcher -> artifacts) on a synthesized ~20k-events/bin recorded
            stream at timebin 250 and 1000, as a real-time factor (1.0 =
            keeps up with the bin cadence; the reference runs 1 query/s).
  large     (--large only, not in the default run) synthetic
            IN1024/FN2048/DB8192 model, float + quantized routes.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...context...}
"""

import argparse
import json
import logging
import os
import signal
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lens_tpu.utils.jaxsetup import setup_jax  # noqa: E402

# Watchdog: the tunneled TPU's claim/compile path can wedge indefinitely
# (see .claude/skills/verify/SKILL.md).  If the TPU run does not finish in
# time, re-exec on the CPU backend so the driver still gets a (clearly
# labeled) measurement instead of a hang.
WATCHDOG_SECS = int(os.environ.get("LENS_BENCH_WATCHDOG", "900"))
SOFT_BUDGET_SECS = int(os.environ.get("LENS_BENCH_BUDGET", "660"))
FORCE_CPU = os.environ.get("LENS_BENCH_CPU") == "1"

if FORCE_CPU:
    from lens_tpu.utils.jaxsetup import force_cpu

    force_cpu()
else:

    def _watchdog(signum, frame):  # pragma: no cover - timing dependent
        sys.stderr.write(
            f"bench: TPU path exceeded {WATCHDOG_SECS}s (wedged relay?); "
            "re-running on CPU backend\n"
        )
        os.environ["LENS_BENCH_CPU"] = "1"
        os.execv(sys.executable, [sys.executable, os.path.abspath(__file__)] + sys.argv[1:])

    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(WATCHDOG_SECS)

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lens_tpu.core.network import (  # noqa: E402
    LensParams,
    forward_counts_from_frames,
)
from lens_tpu.data.dataset import FrameDataset, center_pixel_flat_indices  # noqa: E402
from lens_tpu.ops.fused_forward import best_forward  # noqa: E402
from lens_tpu.ops.raster import make_thresholds  # noqa: E402
from lens_tpu.utils import checkpoint  # noqa: E402

BASELINE_FRAMES_PER_SEC = 10_000.0
BENCH_QUERIES = 1024  # fixed shape => compilation cache hit across runs
TIMEBIN = 250
ITERS = 20
U8_ITERS = 6  # host-uint8 variant: fewer iters (tunnel-bound transfer)
V5E_BF16_PEAK_TFLOPS = 197.0  # v5e MXU peak (bf16 matmul); context for MFU
ROOT = os.path.dirname(os.path.abspath(__file__))
T_START = time.perf_counter()


def _elapsed() -> float:
    return time.perf_counter() - T_START


def _flops_per_frame(n_in: int, n_feat: int, n_out: int, t_steps: int) -> float:
    """Analytic MAC-based FLOPs of the spiking forward (2 flops/MAC, both
    GEMMs, every timestep); elementwise IAF work excluded (it is the
    bandwidth cost, counted separately)."""
    return 2.0 * t_steps * (n_in * n_feat + n_feat * n_out)


def _roll_batches(arr: np.ndarray, iters: int):
    """Distinct pre-staged device batches: identical buffers can be served
    from the relay's execution cache (measurement discipline, BENCHMARKS.md)."""
    return [jnp.asarray(np.roll(arr, i + 1, axis=0)) for i in range(iters)]


def section_headline(result: dict) -> None:
    ds = FrameDataset.load(
        os.path.join(ROOT, "lens/dataset/example-query.csv"),
        os.path.join(ROOT, "lens/dataset/example/davis128/example-query"),
        max_samples=100,
    )
    params = checkpoint.load_model(
        os.path.join(ROOT, "lens/models"),
        "example-reference_LENS_IN100_FN200_DB100.pth",
    )
    reps = -(-BENCH_QUERIES // len(ds))
    intens_np = np.tile(ds.query_intensities_downsampled(10), (reps, 1))[
        :BENCH_QUERIES
    ]
    intens = jnp.asarray(intens_np)
    sel = center_pixel_flat_indices(80, 10)
    u = jnp.asarray(make_thresholds("torch-parity", TIMEBIN, 6400)[:, sel])

    # Measurement discipline (learned on the axon relay): (a) one DISTINCT
    # pre-staged device batch per iteration; (b) block_until_ready does not
    # reliably synchronize through the remote relay, so host materialization
    # is the completion fence — fetching the LAST output fences every earlier
    # one (FIFO), with a middle output fetched as a reordering guard.
    batches = _roll_batches(intens_np, ITERS)
    warm = np.asarray(best_forward(params, intens, u))  # compile + warm
    assert warm.shape == (BENCH_QUERIES, 100)
    _ = [np.asarray(best_forward(params, b, u)) for b in batches[:2]]  # settle

    rates = []
    for _ in range(3):  # median of three windows (tunnel noise)
        t0 = time.perf_counter()
        outs = [best_forward(params, b, u) for b in batches]
        mid = np.asarray(outs[ITERS // 2])
        last = np.asarray(outs[-1])
        dt = time.perf_counter() - t0
        assert mid.shape == last.shape == (BENCH_QUERIES, 100)
        assert mid.sum() > 0 and last.sum() > 0
        rates.append(BENCH_QUERIES * ITERS / dt)
    fps = float(np.median(rates))

    backend = jax.default_backend()
    metric = "event_frames_per_sec_per_chip"
    if backend == "cpu":
        metric += "_CPU_FALLBACK"  # TPU relay unreachable; not a chip number
    flops = _flops_per_frame(100, 200, 100, TIMEBIN)
    # VMEM-traffic model from the kernel's own bottleneck analysis
    # (BENCHMARKS.md): ~11 VMEM passes/step over the f32 membrane tile,
    # feature width padded to the 256-lane tile.
    vmem_bytes_per_frame = 11 * 256 * 4 * TIMEBIN
    result.update(
        {
            "metric": metric,
            "value": round(fps, 1),
            "unit": "frames/s",
            "vs_baseline": round(fps / BASELINE_FRAMES_PER_SEC, 3),
            "flops_per_frame": flops,
            "achieved_gflops": round(fps * flops / 1e9, 1),
            "mfu_pct_vs_bf16_peak": round(
                fps * flops / (V5E_BF16_PEAK_TFLOPS * 1e12) * 100.0, 4
            ),
            "vmem_bw_achieved_gbps": round(fps * vmem_bytes_per_frame / 1e9, 1),
            "bottleneck": "VMEM-bandwidth-bound elementwise IAF chain "
            "(~11 f32 passes/step over the membrane tile); MXU util is "
            "expectedly tiny at this model scale — see BENCHMARKS.md",
            "run_variance_note": "single-run figure; repeated runs on this "
            "relay-tunneled chip have measured 189k-284k frames/s depending "
            "on tunnel load (BENCHMARKS.md headline table) — cross-round "
            "deltas inside that band are environment, not code",
        }
    )
    result["_params"] = params  # reused by the uint8 section
    result["_ds"] = ds
    result["_u"] = u
    result["_sel"] = sel


def section_uint8(result: dict) -> None:
    params, ds, u = result.pop("_params"), result.pop("_ds"), result.pop("_u")
    sel = result.pop("_sel")
    reps = -(-BENCH_QUERIES // len(ds))
    sel_t = tuple(int(i) for i in sel)
    frames_np = np.tile(
        np.asarray(ds.frames, np.uint8).reshape(len(ds), -1), (reps, 1)
    )[:BENCH_QUERIES]
    host_batches = [np.roll(frames_np, i + 1, axis=0) for i in range(U8_ITERS)]
    warm = np.asarray(
        forward_counts_from_frames(params, jnp.asarray(frames_np), u, sel_t)
    )
    assert warm.shape == (BENCH_QUERIES, 100)
    t0 = time.perf_counter()
    outs = [
        forward_counts_from_frames(params, jnp.asarray(b), u, sel_t)
        for b in host_batches
    ]
    mid = np.asarray(outs[U8_ITERS // 2])
    last = np.asarray(outs[-1])
    dt = time.perf_counter() - t0
    assert mid.sum() > 0 and last.sum() > 0
    fps = BENCH_QUERIES * U8_ITERS / dt
    batch_mb = frames_np.nbytes / 1e6
    result.update(
        {
            "uint8_host_frames_per_sec": round(fps, 1),
            # Self-describing caveat (VERDICT r2 ask #8): the number is a
            # property of this container's transport, not of the chip.
            "uint8_host_h2d_mb_per_batch": round(batch_mb, 2),
            "uint8_host_caveat": (
                "h2d-transfer-bound in this container: each batch is "
                f"{batch_mb:.2f} MB of uint8 through the ~50 MB/s axon "
                "tunnel (~8.2k frames/s ceiling at Q=1024). On a PCIe host "
                "(>=16 GB/s) the same transfer is ~0.4 ms/batch and this "
                "variant converges to the device-resident headline."
            ),
        }
    )


def section_sunset(result: dict) -> None:
    """Second bundled model scale: IN49/FN63/DB641 at T=1000 (the brisevent
    sunset traverses — the reference's other shipped checkpoint)."""
    params = checkpoint.load_model(
        os.path.join(ROOT, "lens/models"), "sunset2_LENS_IN49_FN63_DB641.pth"
    )
    t_steps = 1000
    q = BENCH_QUERIES if jax.default_backend() != "cpu" else 128
    rng = np.random.default_rng(0)
    intens_np = rng.uniform(0.0, 1.0, (q, 49)).astype(np.float32)
    u = jnp.asarray(make_thresholds("jax", t_steps, 49))
    batches = _roll_batches(intens_np, 6)
    warm = np.asarray(best_forward(params, jnp.asarray(intens_np), u))
    assert warm.shape == (q, 641)
    t0 = time.perf_counter()
    outs = [best_forward(params, b, u) for b in batches]
    last = np.asarray(outs[-1])
    dt = time.perf_counter() - t0
    assert last.sum() >= 0
    fps = q * len(batches) / dt
    flops = _flops_per_frame(49, 63, 641, t_steps)
    result.update(
        {
            "sunset_frames_per_sec": round(fps, 1),
            "sunset_model": "IN49_FN63_DB641_T1000",
            "sunset_flops_per_frame": flops,
            "sunset_achieved_gflops": round(fps * flops / 1e9, 1),
        }
    )


def _synth_stream(tmpdir: str, timebin_ms: int, n_bins: int, events_per_bin: int) -> str:
    from lens_tpu.tools.make_event_stream import synthesize_events

    ds = FrameDataset.load(
        os.path.join(ROOT, "lens/dataset/example-query.csv"),
        os.path.join(ROOT, "lens/dataset/example/davis128/example-query"),
        max_samples=min(n_bins, 100),
    )
    frames = np.asarray(ds.frames, np.float64)
    reps = -(-n_bins // len(frames))
    frames = np.tile(frames, (reps, 1, 1))[:n_bins]
    events = synthesize_events(
        frames, timebin_ms / 1000.0, events_per_bin, roi_origin=(23, 0), seed=1
    )
    path = os.path.join(tmpdir, f"stream_t{timebin_ms}.npy")
    np.save(path, events)
    return path


def section_stream(result: dict) -> None:
    """Single-stream --event_driven sustained throughput: the full online
    loop (event parse -> event-time raster -> quantized carry dispatch ->
    matcher -> appendable artifacts) on a recorded ~20k-events/bin stream.
    realtime_factor = sustained bins/s x bin length (1.0 = keeps up; the
    host raster build is overlapped with device execution — stream.py's
    one-deep pipeline)."""
    from dataclasses import replace

    from lens_tpu.config import LensConfig
    from lens_tpu.runtime.stream import run_event_driven

    events_per_bin = 20_000
    for timebin_ms, n_bins, chunk in ((250, 96, 1), (1000, 32, 1), (250, 96, 8)):
        with tempfile.TemporaryDirectory() as td:
            stream = _synth_stream(td, timebin_ms, n_bins, events_per_bin)
            cfg = LensConfig(
                timebin=timebin_ms,
                headless=True,
                event_driven=True,
                event_file=stream,
                stream_chunk_bins=chunk,
                data_dir=os.path.join(ROOT, "lens/dataset/"),
                models_dir=os.path.join(ROOT, "lens/models"),
                output_base=os.path.join(td, "out"),
            )
            logging.disable(logging.INFO)  # per-bin cadence logs off stdout
            try:
                # Warm the compile on a short prefix so the timed window is
                # steady-state (remote compiles are minutes-scale).
                warm_stream = os.path.join(td, "warm.npy")
                ev = np.load(stream)
                cutoff = 2 * chunk * timebin_ms / 1000.0 + ev[0, 0]
                np.save(warm_stream, ev[ev[:, 0] < cutoff])
                run_event_driven(replace(cfg, event_file=warm_stream))
                t0 = time.perf_counter()
                matcher = run_event_driven(cfg)
                dt = time.perf_counter() - t0
            finally:
                logging.disable(logging.NOTSET)
            assert matcher is not None
            bins_per_s = n_bins / dt
            suffix = f"t{timebin_ms}" + (f"_chunk{chunk}" if chunk > 1 else "")
            result[f"stream_bins_per_sec_{suffix}"] = round(bins_per_s, 2)
            result[f"stream_realtime_factor_{suffix}"] = round(
                bins_per_s * timebin_ms / 1000.0, 2
            )
    result["stream_events_per_bin"] = events_per_bin
    result["stream_note"] = (
        "end-to-end online loop incl. parse/raster/matcher/artifacts; "
        "host raster build overlapped with device execution (1-deep "
        "pipeline); factor >= 1.0 keeps real time. Reference cadence: "
        "1 query/s on-chip."
    )


def section_large(result: dict) -> None:
    """Synthetic production-scale model: IN1024/FN2048/DB8192 (float +
    quantized routes).  Manual section (--large): its compile is minutes
    through the tunnel and the driver's default run does not need it."""
    from lens_tpu.core.network import SpikeThresholds
    from lens_tpu.runtime.speck_sim import (
        discretize,
        forward_counts_quantized_bucketed,
        quantized_int8_ok,
    )

    n_in, n_feat, n_out, t_steps = 1024, 2048, 8192, 250
    q = 256 if jax.default_backend() != "cpu" else 16
    rng = np.random.default_rng(0)
    params = LensParams(
        w_feat=jnp.asarray(rng.normal(0, 0.05, (n_in, n_feat)), jnp.float32),
        w_out=jnp.asarray(rng.normal(0, 0.05, (n_feat, n_out)), jnp.float32),
        thr_feat=jnp.ones((n_feat,), jnp.float32),
        thr_out=jnp.ones((n_out,), jnp.float32),
    )
    intens_np = rng.uniform(0, 1, (q, n_in)).astype(np.float32)
    u = jnp.asarray(make_thresholds("jax", t_steps, n_in))
    flops = _flops_per_frame(n_in, n_feat, n_out, t_steps)

    warm = np.asarray(best_forward(params, jnp.asarray(intens_np), u, q_bucket=q))
    assert warm.shape == (q, n_out)
    batches = _roll_batches(intens_np, 4)
    t0 = time.perf_counter()
    outs = [best_forward(params, b, u, q_bucket=q) for b in batches]
    last = np.asarray(outs[-1])
    dt = time.perf_counter() - t0
    fps_f = q * len(batches) / dt
    assert last.sum() > 0

    # --precision bf16 route: bf16 GEMM operands, f32 accumulation — the
    # MXU-native mode for this GEMM-bound scale (run_model --precision bf16).
    from lens_tpu.core.network import forward_counts

    warm_b = np.asarray(
        forward_counts(
            params, jnp.asarray(intens_np), u, matmul_dtype=jnp.bfloat16
        )
    )
    assert warm_b.shape == (q, n_out)
    t0 = time.perf_counter()
    outs = [forward_counts(params, b, u, matmul_dtype=jnp.bfloat16) for b in batches]
    last = np.asarray(outs[-1])
    dt = time.perf_counter() - t0
    fps_b = q * len(batches) / dt
    assert last.sum() > 0

    qp = discretize(params, SpikeThresholds(), -1.0)
    warm_q = np.asarray(
        forward_counts_quantized_bucketed(qp, jnp.asarray(intens_np), u, q_bucket=q)
    )
    assert warm_q.shape == (q, n_out)
    t0 = time.perf_counter()
    outs = [
        forward_counts_quantized_bucketed(qp, b, u, q_bucket=q) for b in batches
    ]
    last = np.asarray(outs[-1])
    dt = time.perf_counter() - t0
    fps_q = q * len(batches) / dt

    result.update(
        {
            "large_model": f"IN{n_in}_FN{n_feat}_DB{n_out}_T{t_steps}",
            "large_float_frames_per_sec": round(fps_f, 1),
            "large_quant_frames_per_sec": round(fps_q, 1),
            "large_flops_per_frame": flops,
            "large_float_achieved_tflops": round(fps_f * flops / 1e12, 3),
            "large_float_mfu_pct_vs_bf16_peak": round(
                fps_f * flops / (V5E_BF16_PEAK_TFLOPS * 1e12) * 100.0, 2
            ),
            "large_bf16_frames_per_sec": round(fps_b, 1),
            "large_bf16_achieved_tflops": round(fps_b * flops / 1e12, 3),
            "large_bf16_mfu_pct_vs_bf16_peak": round(
                fps_b * flops / (V5E_BF16_PEAK_TFLOPS * 1e12) * 100.0, 2
            ),
            # Which program the quantized dispatcher picked (the hoisted
            # int8 MXU route when its exactness bound holds, else the scan).
            "large_quant_route": (
                "int8_hoisted" if quantized_int8_ok(qp) else "int32_scan"
            ),
        }
    )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--sections", default="headline,uint8,sunset,stream",
        help="comma list of sections to run (headline must come first)",
    )
    parser.add_argument("--large", action="store_true", help="add the large-model section")
    args = parser.parse_args()
    sections = [s.strip() for s in args.sections.split(",") if s.strip()]
    if args.large and "large" not in sections:
        sections.append("large")

    runners = {
        "headline": section_headline,
        "uint8": section_uint8,
        "sunset": section_sunset,
        "stream": section_stream,
        "large": section_large,
    }
    result: dict = {}
    for name in sections:
        if name != "headline" and _elapsed() > SOFT_BUDGET_SECS:
            result[f"{name}_skipped"] = (
                f"time budget ({SOFT_BUDGET_SECS}s) exhausted at {_elapsed():.0f}s"
            )
            continue
        try:
            runners[name](result)
        except Exception as e:  # a secondary section must not kill the headline
            if name == "headline":
                raise
            result[f"{name}_error"] = f"{type(e).__name__}: {e}"

    for k in ("_params", "_ds", "_u", "_sel"):  # internal plumbing
        result.pop(k, None)
    signal.alarm(0)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
