"""Production-scale demo: a synthetic large place database through every
precision route the framework offers.

Builds an IN1024/FN2048/DB8192 model (beyond anything the reference ships —
its largest is DB641), evaluates one query batch through:

  - the f32 route (XLA scan; the fused kernel's VMEM budget routes it there)
  - the bf16 route (MXU-native operands, f32 accumulation — what
    `--precision bf16` uses; only the bf16 weight rounding differs)
  - the quantized chip simulator (DynapCNN int8 discretization; the
    dispatcher picks the hoisted int8 MXU route here and the result is
    bit-identical to the int32 reference scan)

and reports agreement plus throughput.  Runs anywhere; on CPU use --small.

    python examples/production_scale.py [--small] [--queries 64]
"""

import argparse
import os
import sys
import time

import numpy as np

# Runnable as `python examples/production_scale.py` from a source checkout
# (sys.path[0] is examples/, not the repo root where lens_tpu lives).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="CPU-sized model")
    ap.add_argument("--queries", type=int, default=64)
    args = ap.parse_args()

    from lens_tpu.utils.jaxsetup import setup_jax

    setup_jax()
    import jax.numpy as jnp

    from lens_tpu.core.network import forward_counts, params_from_numpy
    from lens_tpu.ops.raster import make_thresholds
    from lens_tpu.runtime.speck_sim import (
        discretize,
        forward_counts_quantized_bucketed,
        quantized_int8_ok,
    )

    if args.small:
        n_in, n_feat, n_out, t_steps = 100, 200, 512, 50
    else:
        n_in, n_feat, n_out, t_steps = 1024, 2048, 8192, 250
    rng = np.random.default_rng(0)
    params = params_from_numpy(
        rng.normal(0, 0.05, (n_in, n_feat)).astype(np.float32),
        rng.normal(0, 0.05, (n_feat, n_out)).astype(np.float32),
        np.zeros(n_feat, np.float32),
        np.zeros(n_out, np.float32),
    )
    intens = jnp.asarray(rng.uniform(0, 1, (args.queries, n_in)), jnp.float32)
    u = jnp.asarray(make_thresholds("jax", t_steps, n_in))

    def bench(label, fn):
        out = np.asarray(fn())  # warm-up + result
        t0 = time.perf_counter()
        np.asarray(fn())
        dt = time.perf_counter() - t0
        print(f"{label:28s} {args.queries / dt:10,.0f} frames/s")
        return out

    f32 = bench("f32 scan", lambda: forward_counts(params, intens, u))
    bf16 = bench(
        "bf16 operands (f32 accum)",
        lambda: forward_counts(params, intens, u, matmul_dtype=jnp.bfloat16),
    )
    qp = discretize(params)
    quant = bench(
        f"quantized ({'int8 MXU' if quantized_int8_ok(qp) else 'scan'})",
        lambda: forward_counts_quantized_bucketed(qp, intens, u),
    )

    agree = (np.argmax(bf16, axis=1) == np.argmax(f32, axis=1)).mean()
    agree_q = (np.argmax(quant, axis=1) == np.argmax(f32, axis=1)).mean()
    print(f"bf16 top-place agreement with f32:      {agree:6.1%}")
    print(f"quantized top-place agreement with f32: {agree_q:6.1%}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
