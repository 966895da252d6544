"""Initial-rho / cadence sweep on the honest full-GOMP class (TPU).

The honest class converges at p50=60 ADMM iterations from the OSQP default
rho=0.1 (cadence-invariant — see BASELINE.md).  rho0 is traced via
solve_batched_lane(rho0=...), so the whole rho sweep reuses ONE compiled
program per cadence.
"""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import os

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
# Re-assert the env-requested platform over the axon sitecustomize's
# register(): with the plugin registered and the relay dead, jax.devices()
# hangs even under JAX_PLATFORMS=cpu unless forced post-import (the same
# trick tests/conftest.py uses).
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from bench import build_honest_batch
from osqp_solver_tpu.ops import admm
from osqp_solver_tpu.ops.admm_lane import solve_batched_lane


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(a):
    return float(jnp.sum(a))


def main():
    dtype = jnp.float32
    # BATCH env knob: iteration counts are platform-identical in f32, so
    # exact-count sweeps (check_termination=1) run fine on CPU at a small
    # batch while the TPU tunnel is down.
    BATCH = int(__import__("os").environ.get("BATCH", "1024"))
    W, N = 100, 6
    lane = build_honest_batch(BATCH, W, N, dtype)
    sync(lane.ws_l)
    log("batch built")

    cts = [int(s) for s in (sys.argv[1:] or ["30"])]
    rhos = [float(x) for x in __import__("os").environ.get("RHOS", "0.05,0.1").split(",")]

    import os

    ari_mult = int(os.environ.get("ARI_MULT", "1"))
    adaptive = os.environ.get("ADAPTIVE", "1") == "1"
    alpha = float(os.environ.get("ALPHA", "1.6"))
    scaling = int(os.environ.get("SCALING", "10"))
    sigma = float(os.environ.get("SIGMA", "1e-6"))
    anderson = int(os.environ.get("ANDERSON", "0"))
    for ct in cts:
        settings = dataclasses.replace(
            admm.Settings(),
            check_termination=ct,
            adaptive_rho_interval=ct * ari_mult,
            adaptive_rho=adaptive,
            alpha=alpha,
            scaling=scaling,
            sigma=sigma,
            anderson=anderson,
        )

        @jax.jit
        def solve(qps, rho0):
            r = solve_batched_lane(qps, settings, rho0=rho0)
            return r.x, r.status, r.iterations

        reps = 5

        # In-program chained steady-state (see bench.py: per-dispatch
        # timing is floored by the ~25 ms tunnel round-trip).
        @jax.jit
        def solve_k(qps, rho0):
            def body(i, eps):
                r = solve_batched_lane(qps, settings, rho0=rho0 + eps)
                return 0.0 * jnp.sum(r.x)

            return jax.lax.fori_loop(0, reps, body, jnp.asarray(0.0, dtype))

        for rho in rhos:
            r0 = jnp.asarray(rho, dtype)
            t0 = time.time()
            x, status, iters = solve(lane, r0)
            sync(x)
            first = time.time() - t0
            sync(solve_k(lane, r0))
            t0 = time.time()
            sync(solve_k(lane, r0))
            dt = (time.time() - t0) / reps
            n_opt = int(np.sum(np.asarray(status) == 0))
            it = np.asarray(iters)
            log(
                f"ct={ct:3d} rho0={rho:5.3f} a={settings.alpha} sc={settings.scaling}  opt={n_opt}/{BATCH} "
                f"iters p50={int(np.median(it))} p90={int(np.percentile(it,90))} "
                f"max={int(np.max(it))}  {dt*1e3:7.1f} ms/batch "
                f"({n_opt/dt:8.1f} QPs/s)  [first {first:.1f}s]"
            )


if __name__ == "__main__":
    main()
