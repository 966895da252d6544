"""Fleet planning example: the reference's FULL ``run(start, end)``
time-scaling search (``/root/reference/src/gomp-solver.h:38-55``) for a whole
fleet of queries inside ONE compiled device program — the workload the
reference can only run one query at a time.

A batch of (start, end) joint-space queries is planned with
``GOMPSolver.run_batch_padded``: per query the 10-segment horizon-shrinking
search with the reference's warm-slicing quirk, masked per-query survival,
and a ``SphereObstacle`` keep-out (the beyond-reference geometry) in the
workspace.  Uses the measured fleet setting ``Settings(max_iter=300)``
(BASELINE.md round-4: bit-identical plans to the OSQP default at ~8x the
query rate).

Usage:
    JAX_PLATFORMS=cpu python examples/fleet_planning_example.py            # CPU demo
    PYTHONPATH=/root/repo:/root/.axon_site python examples/fleet_planning_example.py \
        --batch 1024 --waypoints 50   # TPU fleet scale
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from osqp_solver_tpu import GOMPSolver, SphereObstacle, constraints as C
from osqp_solver_tpu.models import ur5e
from osqp_solver_tpu.ops.admm import Settings
from osqp_solver_tpu.ops.status import ExitCode


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--waypoints", type=int, default=30)
    ap.add_argument("--segments", type=int, default=10)
    ap.add_argument("--max-iter", type=int, default=300)
    ap.add_argument(
        "--per-query", action="store_true",
        help="give every query its OWN keep-out pose (a fleet of robot "
        "cells with different bin positions) via stack_obstacles — one "
        "compiled program, traced obstacle values",
    )
    args = ap.parse_args()

    N, INF = 6, 1e30
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})")

    balls = [
        ur5e.make_ball("back6", 0.15),
        ur5e.make_ball("tool", 0.05, is_gripper=True),
    ]
    # Keep-out sphere centered on the tool's unconstrained optimum path
    # (the shortest-horizon plan swings the tool through ~(0, -0.29, -0.57);
    # audited by exact FK), so the SCP loop must actively bulge every
    # query's trajectory around it — the audit below checks the clearance.
    sphere = SphereObstacle.create([0.0, -0.28, -0.55], radius=0.12)
    settings = dataclasses.replace(
        Settings(), rho=0.04, check_termination=3, scaling=3,
        max_iter=args.max_iter,
    )
    solver = GOMPSolver(
        max_waypoints=args.waypoints,
        time_step=0.1,
        settings=settings,
        pos_con=C.in_range(N, -2 * np.pi, 2 * np.pi),
        vel_con=C.in_range(N, -np.pi, np.pi),
        acc_con=C.in_range(N, -800 * np.pi / 180, 800 * np.pi / 180),
        con_3d=C.Constraint(
            lower=np.array([-INF, -0.4, -INF]), upper=np.full(3, INF)
        ),
        obstacles=[sphere],
        balls=balls,
        segments=args.segments,
        dtype=jnp.float32,
    )

    rng = np.random.default_rng(0)
    B = args.batch
    starts = 0.02 * rng.standard_normal((B, N))
    end0 = np.zeros(N)
    end0[0] = np.pi
    ends = end0[None] + 0.02 * rng.standard_normal((B, N))

    # Per-query keep-out poses (round-5 extension): every cell's sphere
    # jittered around the shared one; the audit below then checks each
    # query against its OWN obstacle.
    per_query_spheres = None
    obstacles_kw = {}
    if args.per_query:
        from osqp_solver_tpu.gomp.geometry import stack_obstacles

        per_query_spheres = [
            SphereObstacle.create(
                np.asarray(sphere.center) + 0.03 * rng.standard_normal(3),
                radius=float(sphere.radius),
            )
            for _ in range(B)
        ]
        obstacles_kw = {"obstacles": [stack_obstacles(per_query_spheres)]}
        print(f"per-query keep-outs: {B} spheres, 3 cm pose jitter")

    t0 = time.time()
    statuses, trajs, horizons, rounds, admm_iters = solver.run_batch_padded(
        starts, ends, **obstacles_kw
    )
    float(jnp.sum(trajs))  # scalar-readback sync (tunnel-safe)
    wall = time.time() - t0
    st = np.asarray(statuses)
    hz = np.asarray(horizons)
    it = np.asarray(admm_iters)
    n_opt = int((st == int(ExitCode.kOptimal)).sum())
    print(
        f"fleet of {B} full time-scaling queries in {wall:.2f}s "
        f"(compile+solve; steady-state is far faster — see "
        f"benchmarks/planner_batch.py --full)"
    )
    print(f"optimal: {n_opt}/{B}")
    print(
        "winning horizons: "
        + ", ".join(
            f"{w}x{int((hz == w).sum())}" for w in sorted(set(hz.tolist()))
        )
        + f"  (W_max={args.waypoints}, {args.segments} segments)"
    )
    print(
        f"ADMM iterations/query: p50={int(np.median(it))} "
        f"max={int(it.max())}  SCP rounds p50={int(np.median(np.asarray(rounds)))}"
    )

    # Exact-FK audit of the first optimal query: the tool ball must clear
    # ITS keep-out sphere at every live waypoint.
    b = int(np.argmax(st == int(ExitCode.kOptimal)))
    W = args.waypoints
    w = int(hz[b])
    q = np.asarray(trajs[b][: W * N]).reshape(W, N)[:w]
    pts = np.asarray(balls[1].fk_jac_batched(jnp.asarray(q))[0])
    own = per_query_spheres[b] if per_query_spheres else sphere
    d = np.linalg.norm(pts - np.asarray(own.center), axis=-1)
    margin = float(d.min() - (float(own.radius) + balls[1].radius))
    print(f"query {b}: tool keep-out clearance min = {margin:+.4f} m")
    if n_opt == 0 or margin < -1.5e-3:
        print("FAILED: no optimal plan or keep-out violated")
        return 1
    print("OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
