"""Benchmark suite: the five BASELINE.json configs.

Prints one JSON line per config to stdout (diagnostics to stderr):

1. single small trajectory QP (examples/solver-example.cpp shape, CPU-class)
2. 1k randomized box QPs, vmapped ADMM, single chip
3. GOMP-style 100-waypoint 6-DOF trajectory QP with workspace rows
   (honest class, lane driver + fused kernels, in-program steady-state)
4. MPC warm-start sweep (sequential re-solves, cached factorization);
   4b: the same on the flagship W=100 trajectory class (goal-shift sweep)
5. long-horizon block-tridiagonal KKT solve partitioned over the mesh
   (Schur complement; on a single chip this exercises the reference math —
   multi-chip scaling runs on a real slice)

Usage: python benchmarks/run_all.py [--quick]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

# Allow running straight from the repo: python benchmarks/run_all.py
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(name, value, unit, extra=None):
    rec = {"metric": name, "value": round(float(value), 3), "unit": unit}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x))


def build_trajectory_batch(batch, W, N, dtype):
    import jax
    import jax.numpy as jnp

    from osqp_solver_tpu.gomp.trajectory_qp import (
        empty_trajectory_qp,
        with_gomp_boxes,
    )

    base = empty_trajectory_qp(W, N, gripper_flags=(), n_obstacles=0, dtype=dtype)
    pos = (jnp.full(N, -10.0, dtype), jnp.full(N, 10.0, dtype))
    vel = (jnp.full(N, -1.0, dtype), jnp.full(N, 1.0, dtype))
    acc = (jnp.full(N, -2.0, dtype), jnp.full(N, 2.0, dtype))

    def one(i):
        start = 0.02 * jnp.sin(jnp.arange(N, dtype=dtype) + i)
        end = 1.0 + 0.02 * jnp.cos(jnp.arange(N, dtype=dtype) * 1.3 + i)
        return with_gomp_boxes(base, start, end, pos, vel, acc)

    return jax.vmap(one)(jnp.arange(batch, dtype=dtype))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from osqp_solver_tpu.ops import admm, session as S
    from osqp_solver_tpu.ops.qp import dense_qp
    from osqp_solver_tpu.ops.tridiag import (
        block_tridiag_factor,
        block_tridiag_solve,
    )
    dtype = jnp.float32
    dev = jax.devices()[0]
    log(f"device: {dev}")
    settings = admm.Settings()
    reps = 2 if args.quick else 5

    # ---- config 1: single small trajectory QP -----------------------------
    qp1 = jax.tree_util.tree_map(
        lambda a: a[0], build_trajectory_batch(1, 10, 6, dtype)
    )
    f1 = jax.jit(lambda qp: admm.solve(qp, settings).x)
    sync(f1(qp1))
    t0 = time.time()
    for _ in range(reps):
        out = f1(qp1)
    sync(out)
    emit(
        "config1_single_small_qp_latency",
        (time.time() - t0) / reps * 1e3,
        "ms/solve (W=10 trajectory QP, single problem)",
    )

    # ---- config 2: 1k random box QPs --------------------------------------
    def rand_qp(key):
        n, m = 64, 96
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        Mx = jax.random.normal(k1, (n, n), dtype)
        P = Mx @ Mx.T / n + 0.1 * jnp.eye(n, dtype=dtype)
        q = jax.random.normal(k2, (n,), dtype)
        A = jax.random.normal(k3, (m, n), dtype)
        x0 = jax.random.normal(k4, (n,), dtype)
        margin = jnp.abs(jax.random.normal(k5, (m,), dtype)) + 0.1
        Ax0 = A @ x0
        return dense_qp(P, q, A, Ax0 - margin, Ax0 + margin)

    B2 = 256 if args.quick else 1024
    qps2 = jax.vmap(rand_qp)(jax.random.split(jax.random.PRNGKey(0), B2))
    f2 = jax.jit(lambda qps: admm.solve_batched(qps, settings))
    r = f2(qps2)
    n_opt = int(np.sum(np.asarray(r.status) == 0))

    # Steady-state like bench.py: `reps` data-dependent solves inside ONE
    # program (an opaque 0·Σx perturbs the next rep's q), one readback —
    # per-dispatch loops pay the ~25 ms tunnel round-trip per rep.
    @jax.jit
    def f2k(qps):
        def body(i, eps):
            res = admm.solve_batched(qps.replace(q=qps.q + eps), settings)
            return 0.0 * jnp.sum(res.x)

        return jax.lax.fori_loop(0, reps, body, jnp.asarray(0.0, dtype))

    sync(f2k(qps2))
    t0 = time.time()
    sync(f2k(qps2))
    dt = (time.time() - t0) / reps
    emit(
        "config2_random_box_qps_per_sec",
        n_opt / dt,
        f"QPs/s (n=64 m=96 dense, batch {B2}, {n_opt}/{B2} optimal)",
    )

    # ---- config 3: GOMP 100-waypoint trajectory batch ---------------------
    # The HONEST class: UR5e 2-ball workspace rows + 1 obstacle, matching
    # examples/solver-example.cpp:37-51 (and bench.py's headline) — via the
    # lane-major driver + fused chunk kernel (bench.py settings).  Measured
    # like bench.py: `reps` data-dependent solves inside ONE program (each
    # per-dispatch measurement pays a ~25 ms tunnel round-trip).
    import dataclasses as _dc

    from bench import build_honest_batch
    from osqp_solver_tpu.ops.admm_lane import solve_batched_lane

    B3 = 128 if args.quick else 1024
    qps3 = build_honest_batch(B3, 100, 6, dtype)
    settings3 = _dc.replace(
        settings, rho=0.04, check_termination=2, adaptive_rho_interval=45,
        scaling=3, termination_warmup=21,  # bench.py settings (BASELINE.md)
    )
    f3 = jax.jit(lambda qps: solve_batched_lane(qps, settings3))
    r = f3(qps3)
    n_opt3 = int(np.sum(np.asarray(r.status) == 0))

    @jax.jit
    def f3k(qps):
        def body(i, eps):
            res = solve_batched_lane(qps, settings3, rho0=settings3.rho + eps)
            return 0.0 * jnp.sum(res.x)

        return jax.lax.fori_loop(0, reps, body, jnp.asarray(0.0, dtype))

    sync(f3k(qps3))
    t0 = time.time()
    sync(f3k(qps3))
    dt = (time.time() - t0) / reps
    emit(
        "config3_gomp_100wp_qps_per_sec",
        n_opt3 / dt,
        f"QPs/s (100-waypoint 6-DOF UR5e, workspace+obstacle rows, "
        f"batch {B3}, {n_opt3}/{B3} optimal)",
    )

    # ---- config 4: MPC warm-start sweep -----------------------------------
    n = 8
    qp4 = dense_qp(
        np.eye(n, dtype=np.float32),
        np.zeros(n, np.float32),
        np.eye(n, dtype=np.float32),
        -np.ones(n, np.float32),
        np.ones(n, np.float32),
    )
    sess = S.setup(qp4, settings)
    steps = 1000 if args.quick else 10000
    shifts = jnp.linspace(0.0, 0.3, steps)[:, None] * jnp.ones(n, dtype)

    def apply_update(base, s):
        return base.replace(l=-1.0 + s, u=1.0 + s)

    f4 = jax.jit(lambda se, u: S.mpc_scan(se, u, apply_update, settings))
    _, (xs, st4, _) = f4(sess, shifts)
    sync(xs)
    t0 = time.time()
    _, (xs, st4, it4) = f4(sess, shifts)
    sync(xs)
    dt = time.time() - t0
    emit(
        "config4_mpc_resolves_per_sec",
        steps / dt,
        f"re-solves/s ({steps} sequential bound updates, cached factor)",
    )

    # ---- config 4b: MPC on the flagship trajectory class -------------------
    # Receding-horizon sweep on ONE honest W=100 UR5e QP: each step shifts
    # the goal-position bounds, re-solving warm-started with the cached
    # factor (reference analogue: warm-started sequential Solve() calls,
    # gomp-solver.h:41-52 / osqp-wrapper.h Solve-to-Solve carry).
    from osqp_solver_tpu.gomp.geometry import HorizontalLine
    from osqp_solver_tpu.gomp.trajectory import calc_warm_start_jnp
    from osqp_solver_tpu.gomp.trajectory_qp import (
        empty_trajectory_qp,
        linearize_workspace,
        with_gomp_boxes,
    )
    from osqp_solver_tpu.models import ur5e

    W4, N4, DT4, INF4 = 100, 6, 0.1, 1e30
    balls4 = (
        ur5e.make_ball("back6", 0.15),
        ur5e.make_ball("tool", 0.05, is_gripper=True),
    )
    start4 = jnp.zeros(N4, dtype)
    end4 = jnp.asarray([np.pi, 0, 0, 0, 0, 0], dtype)
    qp4b = empty_trajectory_qp(
        W4, N4, gripper_flags=(False, True), n_obstacles=1, dtype=dtype
    )
    qp4b = with_gomp_boxes(
        qp4b, start4, end4,
        (jnp.full(N4, -2 * np.pi, dtype), jnp.full(N4, 2 * np.pi, dtype)),
        (jnp.full(N4, -np.pi * DT4, dtype), jnp.full(N4, np.pi * DT4, dtype)),
        (jnp.full(N4, -800 * np.pi / 180 * DT4**2, dtype),
         jnp.full(N4, 800 * np.pi / 180 * DT4**2, dtype)),
    )
    qp4b = linearize_workspace(
        qp4b, balls4, [HorizontalLine.create((0.0, 1.0), (0.35, 0.0, 0.15))],
        (jnp.asarray([-INF4, -0.4, -INF4], dtype),
         jnp.asarray([INF4, INF4, INF4], dtype)),
        calc_warm_start_jnp(start4, end4, W4),
    )
    # Warm re-solves converge in a handful of iterations — check often
    # (cadence is the floor on iterations-per-re-solve).
    settings4b = _dc.replace(settings, check_termination=5)
    sess4b = S.setup(qp4b, settings4b)
    steps4b = 100 if args.quick else 1000
    deltas = 1e-4 * jnp.sin(jnp.arange(steps4b, dtype=dtype))[:, None] * jnp.ones(
        6, dtype
    )

    def apply_goal_shift(base, d):
        # Shift the final-waypoint position equality (pos rows of waypoint
        # W-1) — bounds-only, factor stays valid.
        pos_l = base.pos_l.at[-1].add(d)
        pos_u = base.pos_u.at[-1].add(d)
        return base.replace(pos_l=pos_l, pos_u=pos_u)

    f4b = jax.jit(lambda se, u: S.mpc_scan(se, u, apply_goal_shift, settings4b))
    _, (xs4b, st4b, it4b) = f4b(sess4b, deltas)
    sync(xs4b)
    t0 = time.time()
    _, (xs4b, st4b, it4b) = f4b(sess4b, deltas)
    sync(xs4b)
    dt = time.time() - t0
    n_opt4b = int(np.sum(np.asarray(st4b) == 0))
    emit(
        "config4b_trajectory_mpc_resolves_per_sec",
        steps4b / dt,
        f"re-solves/s (W=100 UR5e honest QP, {steps4b} goal shifts, "
        f"{n_opt4b}/{steps4b} optimal, mean "
        f"{float(np.mean(np.asarray(it4b))):.1f} ADMM iters/re-solve)",
    )

    # ---- config 5: long-horizon Schur KKT (cached-factor path) ------------
    # ADMM amortizes ONE factorization over many solves (osqp-wrapper.h:33-43
    # cache semantics), so the numbers that matter are the cached per-
    # iteration solve and the one-time factor — measured separately, with a
    # chunk-count sweep.  The sequential scan at B=12 is LATENCY-bound on
    # TPU (~10k tiny sequential steps); chunking trades a ~1.5× memory-
    # traffic redundancy for a K× cut in sequential steps, so on one chip
    # the best K is large (r3 TPU sweep: K=64 solve 3.8 ms vs scan 40.9 ms).
    from osqp_solver_tpu.parallel.schur import schur_factor, schur_solve_cached

    W5 = 2000 if args.quick else 10000
    Bb = 12
    key = jax.random.PRNGKey(7)
    blocks = jax.random.normal(key, (W5, Bb, Bb), dtype)
    diag = jnp.einsum("tij,tkj->tik", blocks, blocks) + 5.0 * jnp.eye(Bb, dtype=dtype)
    lower = 0.2 * jax.random.normal(jax.random.PRNGKey(8), (W5 - 1, Bb, Bb), dtype)
    b5 = jax.random.normal(jax.random.PRNGKey(9), (W5, Bb), dtype)

    def sync_tree(t):
        import jax as _jax

        return float(sum(jnp.sum(x) for x in _jax.tree_util.tree_leaves(t)))

    def t_of(fn, *a):
        sync_tree(fn(*a))
        t0 = time.time()
        for _ in range(reps):
            out = fn(*a)
        sync_tree(out)
        return (time.time() - t0) / reps

    f_seq_factor = jax.jit(block_tridiag_factor)
    fac_seq = f_seq_factor(diag, lower)
    t_seq_factor = t_of(f_seq_factor, diag, lower)
    t_seq_solve = t_of(jax.jit(block_tridiag_solve), fac_seq, b5)
    extra5 = {
        "sequential_factor_ms": round(t_seq_factor * 1e3, 2),
        "sequential_solve_ms": round(t_seq_solve * 1e3, 2),
    }
    best = (None, 1e9, 1e9)
    for K in (8, 64) if args.quick else (8, 32, 64, 128):
        fK = jax.jit(lambda d, l, K=K: schur_factor(d, l, K))
        fac = fK(diag, lower)
        t_f = t_of(fK, diag, lower)
        t_s = t_of(jax.jit(schur_solve_cached), fac, b5)
        extra5[f"K{K}_factor_ms"] = round(t_f * 1e3, 2)
        extra5[f"K{K}_solve_ms"] = round(t_s * 1e3, 2)
        if t_s < best[2]:
            best = (K, t_f, t_s)
    Kb, t_f, t_s = best
    emit(
        "config5_schur_10k_horizon_cached_solve_ms",
        t_s * 1e3,
        f"ms/cached-factor KKT solve (W={W5} B={Bb}, best K={Kb}; "
        f"sequential scan {t_seq_solve*1e3:.1f} ms)",
        {
            **extra5,
            "best_chunks": Kb,
            "solve_speedup_vs_sequential": round(t_seq_solve / t_s, 2),
            "factor_speedup_vs_sequential": round(t_seq_factor / t_f, 2),
        },
    )


if __name__ == "__main__":
    main()
