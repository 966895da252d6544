"""Headline benchmark: batched 100-step trajectory QPs solved per second.

BASELINE.md: the reference publishes no numbers; the north-star target is
10,000 batched 100-waypoint trajectory QPs/sec at OSQP-matching accuracy on a
v5e-8 (8 chips) → 1,250 QPs/sec/chip.  ``vs_baseline`` reports the measured
single-chip throughput against that per-chip north-star target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
All diagnostics go to stderr.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    # Persistent compile cache: the batched solver's XLA compile is ~100 s at
    # batch 256 (superlinear in batch); cache it across bench invocations.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp

    from osqp_solver_tpu.gomp.trajectory_qp import (
        empty_trajectory_qp,
        with_gomp_boxes,
    )
    from osqp_solver_tpu.ops import admm

    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")

    dtype = jnp.float32
    # The serial W×iteration dependency chain dominates latency, so per-batch
    # time is ~flat in batch size (validated: 256→36 ms, 512→49 ms,
    # 1024→81 ms ⇒ 12.7k QPs/s).  First execution on the tunneled chip costs
    # ~1-2 min extra (program upload), compile ~25 s (persistently cached).
    BATCH, W, N = 1024, 100, 6
    settings = admm.Settings()

    base = empty_trajectory_qp(W, N, gripper_flags=(), n_obstacles=0, dtype=dtype)
    pos = (jnp.full(N, -10.0, dtype), jnp.full(N, 10.0, dtype))
    vel = (jnp.full(N, -1.0, dtype), jnp.full(N, 1.0, dtype))
    acc = (jnp.full(N, -2.0, dtype), jnp.full(N, 2.0, dtype))

    def one(i):
        start = 0.02 * jnp.sin(jnp.arange(N, dtype=dtype) + i)
        end = 1.0 + 0.02 * jnp.cos(jnp.arange(N, dtype=dtype) * 1.3 + i)
        return with_gomp_boxes(base, start, end, pos, vel, acc)

    qps = jax.vmap(one)(jnp.arange(BATCH, dtype=dtype))

    @jax.jit
    def solve_all(qps):
        res = jax.vmap(lambda qp: admm.solve(qp, settings))(qps)
        return res.x, res.status, res.iterations, res.prim_res, res.dual_res

    # NOTE: synchronization is via a scalar readback (jnp.sum) rather than
    # block_until_ready — the latter is unreliable on tunneled platforms.
    def sync(a):
        return float(jnp.sum(a))

    t0 = time.time()
    x, status, iters, pr, dr = solve_all(qps)
    sync(x)
    log(f"compile+first run: {time.time() - t0:.2f}s")

    n_opt = int(np.sum(np.asarray(status) == 0))
    log(
        f"optimal: {n_opt}/{BATCH}  iters p50={int(np.median(iters))} "
        f"max={int(np.max(iters))}  prim_res max={float(np.max(pr)):.2e}"
    )

    # In-order dispatch serializes the reps on-device; one readback at the
    # end amortizes the tunnel round-trip out of the per-batch time.
    reps = 10
    t0 = time.time()
    outs = [solve_all(qps) for _ in range(reps)]
    for o in outs:
        sync(o[0])
    dt = (time.time() - t0) / reps
    qps_per_sec = n_opt / dt
    log(f"steady-state: {dt*1e3:.1f} ms/batch -> {qps_per_sec:.1f} QPs/s")

    north_star_per_chip = 10000.0 / 8.0
    print(
        json.dumps(
            {
                "metric": "trajectory_qps_per_sec_per_chip",
                "value": round(qps_per_sec, 2),
                "unit": "QPs/s (100-waypoint 6-DOF, OSQP 1e-3 accuracy)",
                "vs_baseline": round(qps_per_sec / north_star_per_chip, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
