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
    import jax.numpy as jnp

    from osqp_solver_tpu.gomp.trajectory_qp import (
        empty_trajectory_qp,
        with_gomp_boxes,
    )
    from osqp_solver_tpu.ops import admm

    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")

    dtype = jnp.float32
    # NOTE: batch 256 is the validated sweet spot on the tunneled single
    # chip; batch 1024 triggers a pathological compile of the fused kernel
    # inside the vmapped while-loop (tracked for round 2).
    BATCH, W, N = 256, 100, 6
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
