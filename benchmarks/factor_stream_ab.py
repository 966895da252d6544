"""Hardware A/B: 2-byte factor stream during the warmup chunk
(Settings.factor_warmup_stream) on the honest headline class.

The convergence side is settled by benchmarks/factor_round_sweep.py (CPU,
platform-identical iteration counts): a full f16 solve needs ~4x the
iterations; an f16 WARMUP (21 of ~28 iterations) costs ~+6 iterations
(27 -> 33 p50).  Byte model: the factor is ~62% of the chunk kernel's
streams and the warmup streams it at half bytes, so the A/B is
  none: 27 iterations x 1.0
  f16:  21 x (1 - 0.31) + 12 x 1.0   ~= byte-neutral
This script measures what actually matters: ms/batch on the TPU, plus
iteration parity — the record for docs/ROADMAP.md either way.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/factor_stream_ab.py
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from bench import build_honest_batch
from osqp_solver_tpu.ops import admm
from osqp_solver_tpu.ops.admm_lane import solve_batched_lane


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    dtype = jnp.float32
    B = int(os.environ.get("BATCH", "1024"))
    W, N = 100, 6
    lane = build_honest_batch(B, W, N, dtype)
    float(jnp.sum(lane.ws_l))
    log(f"batch built: {B} x W={W}")

    base = dataclasses.replace(
        admm.Settings(), check_termination=2, rho=0.04, scaling=3,
        adaptive_rho_interval=60, termination_warmup=21,
    )
    reps = 5
    out = {}
    for mode in ("none", os.environ.get("STREAM", "f16")):
        settings = dataclasses.replace(base, factor_warmup_stream=mode)

        @jax.jit
        def solve(qps):
            r = solve_batched_lane(qps, settings)
            return r.x, r.status, r.iterations

        @jax.jit
        def solve_k(qps):
            def body(i, eps):
                r = solve_batched_lane(qps, settings, rho0=0.04 + eps)
                return 0.0 * jnp.sum(r.x)

            return jax.lax.fori_loop(0, reps, body, jnp.asarray(0.0, dtype))

        t0 = time.time()
        x, status, iters = solve(lane)
        float(jnp.sum(x))
        first = time.time() - t0
        n_opt = int(np.sum(np.asarray(status) == 0))
        it = np.asarray(iters)
        float(solve_k(lane))  # warm the chained program
        t0 = time.time()
        float(solve_k(lane))
        dt = (time.time() - t0) / reps
        log(
            f"factor_warmup_stream={mode:5s} opt={n_opt}/{B} "
            f"iters p50={int(np.median(it))} max={int(np.max(it))}  "
            f"{dt*1e3:.1f} ms/batch ({n_opt/dt:.0f} QPs/s) [first {first:.1f}s]"
        )
        out[mode] = {
            "ms_per_batch": round(dt * 1e3, 2),
            "qps": round(n_opt / dt, 1),
            "optimal": n_opt,
            "iters_p50": int(np.median(it)),
            "iters_max": int(np.max(it)),
        }

    streamed = [k for k in out if k != "none"]
    print(json.dumps({
        "metric": "factor_warmup_stream_f16_ab",
        # STREAM=none re-measures just the baseline: no ratio then.
        "value": round(
            out[streamed[0]]["ms_per_batch"] / out["none"]["ms_per_batch"], 3
        ) if streamed else None,
        "unit": "stream/none ms ratio on the honest class (<1 = 2-byte stream wins)",
        **out,
    }))


if __name__ == "__main__":
    main()
