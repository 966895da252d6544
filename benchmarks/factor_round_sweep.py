"""Reduced-precision factor-stream convergence sweep (Settings.factor_round).

Round 2 measured bf16 factor streams as a dead end (dual residual floors
above the 1e-3 tolerance; 1 refinement step insufficient, 2 recover but
triple the substitution passes).  The missing datapoint: **IEEE fp16 has a
16× finer mantissa than bf16 at the same 2 bytes** (eps 4.9e-4 vs 7.8e-3),
and after Ruiz equilibration the factor entries are O(1), so fp16's narrow
exponent range is irrelevant.  If the fp16-rounded factor converges with
ZERO refinement at unchanged iteration counts, a 2-byte factor stream cuts
the fused chunk kernel's dominant stream bytes in half with no extra passes.

Iteration counts are platform-identical in f32 (BASELINE.md), so this
convergence sweep runs on CPU; the byte saving itself is a TPU kernel
change gated on this result.

Usage: JAX_PLATFORMS=cpu BATCH=64 python benchmarks/factor_round_sweep.py
"""
import dataclasses
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
    BATCH = int(os.environ.get("BATCH", "64"))
    W = int(os.environ.get("W", "100"))
    N = 6
    lane = build_honest_batch(BATCH, W, N, dtype)
    float(jnp.sum(lane.ws_l))
    log(f"batch built: {BATCH} x W={W}")

    # Headline-class settings (bench.py): rho0=0.04, ct=2, 3 Ruiz,
    # adaptation deferred past the measured tail.
    base = dataclasses.replace(
        admm.Settings(), check_termination=2, rho=0.04, scaling=3,
        adaptive_rho_interval=60,
    )
    results = {}
    for mode in ("none", "bf16", "f16"):
        settings = dataclasses.replace(base, factor_round=mode)

        @jax.jit
        def solve(qps):
            r = solve_batched_lane(qps, settings)
            return r.status, r.iterations, r.prim_res, r.dual_res

        t0 = time.time()
        status, iters, pr, dr = solve(lane)
        n_opt = int(np.sum(np.asarray(status) == 0))
        it = np.asarray(iters)
        log(
            f"factor_round={mode:5s}  optimal {n_opt}/{BATCH}  "
            f"iters p50={int(np.median(it))} max={int(np.max(it))}  "
            f"prim_res max={float(np.max(pr)):.2e} "
            f"dual_res max={float(np.max(dr)):.2e}  "
            f"[{time.time()-t0:.1f}s]"
        )
        results[mode] = {
            "optimal": n_opt, "batch": BATCH,
            "iters_p50": int(np.median(it)), "iters_max": int(np.max(it)),
            "dual_res_max": float(np.max(dr)),
        }

    import json

    parity = results["f16"]["iters_p50"] == results["none"]["iters_p50"]
    print(json.dumps({
        "metric": "factor_round_f16_convergence",
        "value": results["f16"]["optimal"] / BATCH,
        "unit": f"fraction optimal (f16 factor, W={W}; "
                f"iteration parity with f32: {parity})",
        **{k: v for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
