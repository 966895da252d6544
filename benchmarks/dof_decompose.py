"""Decompose the 7-DOF (iiwa14) planner cost vs the 6-DOF UR5e
(VERDICT r3 next #5): how much of the measured ~26% planner-query gap is

  (a) per-iteration stream bytes — ANALYTIC, from the chunk kernel's own
      stream lists (the factor pack Tp = (2N)(2N+1)/2 grows quadratically:
      80 -> 112 padded rows; most other pads coincide at this class);
  (b) ADMM iteration-count differences between the two problem classes;
  (c) the SCP re-linearization (SoA FK + geometric Jacobian, scales ~N);
  (d) residual per-chunk fixed costs (the remainder).

Measured pieces: one warm-started solve_batched_lane call (ms + iterations)
and one linearize_workspace call, batch 1024 x W=50 on TPU, per robot.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/dof_decompose.py
"""
from __future__ import annotations

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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def stream_rows_per_wp(lane, ct: int) -> float:
    """Exact per-waypoint per-iteration streamed rows of the fused chunk
    kernel in hrec form — same enumeration as bench.py's HBM accounting."""
    from osqp_solver_tpu.ops.admm_fused import (
        _coef_layout, _tri_maps, state_rows,
    )

    N = lane.n_dim
    B2 = 2 * N
    Rp = lane.rows_per_waypoint_padded
    _, _, _, CRp = _coef_layout(lane)
    _, _, Tp = _tri_maps(B2)
    _, SRp = state_rows(lane)
    PNp = 8
    return (
        2 * Tp + 2 * PNp + 2 * CRp
        + B2 + 2 * Rp
        + 2 * SRp + SRp
        + 2 * B2 + 2 * Rp
        + (2 * 2 * Rp + PNp) / ct
    )


def main():
    from osqp_solver_tpu import constraints as C
    from osqp_solver_tpu.gomp.planner import GOMPSolver
    from osqp_solver_tpu.gomp.trajectory import calc_warm_start_jnp
    from osqp_solver_tpu.gomp.trajectory_qp import (
        empty_trajectory_qp,
        linearize_workspace,
        with_gomp_boxes,
    )
    from osqp_solver_tpu.gomp.trajectory_qp_lane import from_trailing
    from osqp_solver_tpu.models import dh_robot, ur5e
    from osqp_solver_tpu.ops import admm
    from osqp_solver_tpu.ops.admm_lane import solve_batched_lane

    dtype = jnp.float32
    INF = 1e30
    B, W = int(os.environ.get("BATCH", "1024")), 50
    ct = 3
    # Fixed-iteration discipline (as benchmarks/scaling.py): unreachable
    # tolerances pin EXACTLY F iterations on both robots, so the ms ratio
    # is a pure per-iteration cost ratio — the two classes otherwise
    # converge at different iteration counts (and the π-sweep is not even
    # feasible for the iiwa14's workspace floor), which would confound the
    # decomposition.
    F = 20
    settings = dataclasses.replace(
        admm.Settings(), rho=0.04, check_termination=ct, scaling=3,
        eps_abs=1e-30, eps_rel=1e-30, max_iter=F, adaptive_rho=False,
    )
    rng = np.random.default_rng(0)

    out = {}
    for name in ("ur5e", "iiwa14"):
        if name == "ur5e":
            N = 6
            balls = [
                ur5e.make_ball("back6", 0.15),
                ur5e.make_ball("tool", 0.05, is_gripper=True),
            ]
        else:
            robot = dh_robot.IIWA14
            N = robot.n_joints
            balls = [
                robot.make_ball(link=N - 1, radius=0.15),
                robot.make_ball(radius=0.05, is_gripper=True),
            ]
        con3d = (
            jnp.asarray([-INF, -0.4, -INF], dtype), jnp.full(3, INF, dtype)
        )
        boxes = tuple(
            (jnp.full(N, lo, dtype), jnp.full(N, hi, dtype))
            for lo, hi in (
                (-2 * np.pi, 2 * np.pi),
                (-np.pi * 0.1, np.pi * 0.1),  # pre-scaled by dt=0.1
                (-800 * np.pi / 180 * 0.01, 800 * np.pi / 180 * 0.01),
            )
        )
        starts = jnp.asarray(0.02 * rng.standard_normal((B, N)), dtype)
        end0 = np.zeros(N)
        end0[0] = np.pi
        ends = jnp.asarray(
            end0[None] + 0.02 * rng.standard_normal((B, N)), dtype
        )

        def build_one(start, end):
            warm = calc_warm_start_jnp(start, end, W)
            qp = empty_trajectory_qp(W, N, (False, True), 0, dtype)
            qp = with_gomp_boxes(qp, start, end, *boxes)
            return linearize_workspace(qp, balls, [], con3d, warm), warm

        build = jax.jit(lambda s, e: jax.vmap(build_one, out_axes=-1)(s, e))
        qp_t, warm = build(starts, ends)
        float(jnp.sum(warm))

        lane = from_trailing(qp_t, row_layout="waypoint")

        solve = jax.jit(
            lambda lane, wx: solve_batched_lane(lane, settings, warm_x=wx)
        )
        lin = jax.jit(
            lambda qp_t, xs: jax.vmap(
                lambda qp, x: linearize_workspace(qp, balls, [], con3d, x),
                in_axes=-1, out_axes=-1,
            )(qp_t, xs)
        )

        res = solve(lane, warm.T)
        float(jnp.sum(res.x))
        iters = np.asarray(res.iterations)
        n_opt = int(np.sum(np.asarray(res.status) == 0))
        reps = 5
        t0 = time.time()
        for _ in range(reps):
            res = solve(lane, warm.T)
        float(jnp.sum(res.x))
        solve_ms = (time.time() - t0) / reps * 1e3

        xs = res.x.T
        q2 = lin(qp_t, xs)
        float(jnp.sum(q2.ws_l))
        t0 = time.time()
        for _ in range(reps):
            q2 = lin(qp_t, xs)
        float(jnp.sum(q2.ws_l))
        lin_ms = (time.time() - t0) / reps * 1e3

        rows = stream_rows_per_wp(lane, ct)
        log(
            f"[{name}] N={N} solve {solve_ms:.2f} ms/batch "
            f"(opt {n_opt}/{B}, iters p50={int(np.median(iters))} "
            f"max={int(np.max(iters))}), linearize {lin_ms:.2f} ms, "
            f"model rows/wp/iter {rows:.1f}"
        )
        out[name] = {
            "N": N, "solve_ms": round(solve_ms, 2),
            "lin_ms": round(lin_ms, 2),
            "iters_p50": int(np.median(iters)),
            "optimal": n_opt,
            "model_rows_per_wp_iter": round(rows, 1),
        }

    r = out["iiwa14"]
    u = out["ur5e"]
    print(json.dumps({
        "metric": "dof7_cost_decomposition",
        "value": round(r["solve_ms"] / u["solve_ms"], 3),
        "unit": "iiwa14/ur5e solve ms ratio (batch 1024 x W=50)",
        "model_bytes_ratio": round(
            r["model_rows_per_wp_iter"] / u["model_rows_per_wp_iter"], 3
        ),
        # No iters_ratio here: the fixed-iteration discipline pins both
        # robots at exactly F iterations by construction, so a ratio would
        # read as a measurement while being a constant 1.0 — class
        # iteration-count differences are visible in the converging
        # planner_batch rows instead.
        "lin_ratio": round(r["lin_ms"] / u["lin_ms"], 3),
        **out,
    }))


if __name__ == "__main__":
    main()
