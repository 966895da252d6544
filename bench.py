"""Headline benchmark: batched trajectory QPs solved per second — HONEST class.

The headline metric solves the full-GOMP QP class of the reference example
(``/root/reference/examples/solver-example.cpp:37-51``): 100-waypoint 6-DOF
UR5e trajectory QPs carrying two RobotBall linearizations (wrist r=0.15
non-gripper, tool r=0.05 gripper → 3 workspace rows/waypoint with dense 3×6
Jacobian blocks) plus one HorizontalLine obstacle (2 Z-rows/waypoint), the
workspace floor y ≥ −0.4 — not the box-only class (reported as a secondary
metric).  BASELINE.md north star: 10,000 QPs/s on a v5e-8 → 1,250 QPs/s/chip;
``vs_baseline`` is measured against that per-chip share.

Also reports the achieved factor+solve FLOP rate (VERDICT r1 §Missing-4):
the ADMM hot loop is a sequential banded recurrence — latency-bound lane-wise
VPU work, so the interesting number is QPs/s, with GFLOP/s showing how far
from (irrelevant) MXU peak the structure sits.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
All diagnostics go to stderr.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_honest_batch(batch, W, N, dtype):
    import jax
    import jax.numpy as jnp

    from osqp_solver_tpu.gomp.geometry import HorizontalLine
    from osqp_solver_tpu.gomp.trajectory import calc_warm_start_jnp
    from osqp_solver_tpu.gomp.trajectory_qp import (
        empty_trajectory_qp,
        linearize_workspace,
        with_gomp_boxes,
    )
    from osqp_solver_tpu.models import ur5e

    DT, INF = 0.1, 1e30
    balls = (
        ur5e.make_ball("back6", 0.15),
        ur5e.make_ball("tool", 0.05, is_gripper=True),
    )
    obstacles = [HorizontalLine.create((0.0, 1.0), (0.35, 0.0, 0.15))]
    con3d = (jnp.asarray([-INF, -0.4, -INF], dtype),
             jnp.asarray([INF, INF, INF], dtype))
    pos = (jnp.full(N, -2 * np.pi, dtype), jnp.full(N, 2 * np.pi, dtype))
    vel = (jnp.full(N, -np.pi * DT, dtype), jnp.full(N, np.pi * DT, dtype))
    acc = (jnp.full(N, -800 * np.pi / 180 * DT**2, dtype),
           jnp.full(N, 800 * np.pi / 180 * DT**2, dtype))
    base = empty_trajectory_qp(
        W, N, gripper_flags=(False, True), n_obstacles=1, dtype=dtype
    )

    def one(i):
        start = 0.02 * jnp.sin(jnp.arange(N, dtype=dtype) + i)
        end = jnp.asarray([np.pi, 0, 0, 0, 0, 0], dtype) + 0.02 * jnp.cos(
            jnp.arange(N, dtype=dtype) * 1.3 + i
        )
        qp = with_gomp_boxes(base, start, end, pos, vel, acc)
        warm = calc_warm_start_jnp(start, end, W)
        return linearize_workspace(qp, balls, obstacles, con3d, warm)

    # out_axes=-1: the vmapped assembly writes the batch-trailing (lane-major)
    # layout directly — the whole solve then runs with zero relayouts.
    from osqp_solver_tpu.gomp.trajectory_qp_lane import from_trailing

    build = jax.jit(jax.vmap(one, out_axes=-1))
    # The vmapped FK/jacfwd build materializes (B, W, 4, 6, 4) DH-chain
    # temporaries whose tiny trailing dims pad ~21x on TPU — at W=802,
    # batch 1024 that OOMs HBM (19.6 G > 15.75 G) while the SOLVE fits
    # easily.  Build in batch slices (one-time cost, outside the measured
    # loop) and concatenate on the trailing batch axis.
    slice_b = batch if batch * W <= 256 * 802 else max(128, (256 * 802) // W)
    if slice_b >= batch:
        qp_t = build(jnp.arange(batch, dtype=dtype))
    else:
        parts = [
            build(jnp.arange(i, min(i + slice_b, batch), dtype=dtype))
            for i in range(0, batch, slice_b)
        ]
        qp_t = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=-1), *parts
        )
    return from_trailing(
        qp_t,
        row_layout="waypoint",  # contiguous per-waypoint rows: fused chunk kernel
    )


def build_box_batch(batch, W, N, dtype):
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

    from osqp_solver_tpu.gomp.trajectory_qp_lane import from_trailing

    return from_trailing(
        jax.vmap(one, out_axes=-1)(jnp.arange(batch, dtype=dtype)),
        row_layout="waypoint",
    )


def main():
    import jax

    # Persistent compile cache: the batched solver's XLA compile is long at
    # batch 1024 (superlinear in batch); cache it across bench invocations.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp

    from osqp_solver_tpu.ops import admm
    from osqp_solver_tpu.ops.admm_lane import solve_batched_lane

    # Fail fast if the TPU tunnel is dead: jax.devices() otherwise retries
    # forever (observed when the relay process died mid-round).
    import threading

    def _watchdog():
        log(
            "FATAL: jax.devices() hung >120 s — TPU tunnel/relay is down "
            "(check the relay ports, e.g. 127.0.0.1:8082)."
        )
        os._exit(3)

    wd = threading.Timer(120.0, _watchdog)
    wd.daemon = True
    wd.start()
    dev = jax.devices()[0]
    wd.cancel()
    log(f"device: {dev} platform={dev.platform}")

    dtype = jnp.float32
    BATCH, W, N = 1024, 100, 6
    # OSQP-default tolerances (eps_abs = eps_rel = 1e-3, unchanged); initial
    # ρ, Ruiz iteration count, and the termination-check cadence are pure
    # performance knobs.  Exact-count sweeps (check_termination=1 on CPU —
    # iteration counts are platform-identical in f32, BASELINE.md): the
    # honest class converges in ≤29 iterations from ρ0 = 0.04 WITHOUT ρ
    # adaptation (vs p50 = 60 from the OSQP default ρ = 0.1 with adapt-at-30
    # — the first adaptation used to *extend* the tail), and 5 Ruiz
    # iterations equilibrate as well as 10 (max iters unchanged) at half the
    # kernel cost.  Adaptation stays ON as a safety net but deferred to
    # iteration 45, past the measured worst case, so no refactor fires on
    # the benchmark class while pathological problems still recover.
    # OSQP_FACTOR_FORM=hrec / OSQP_TERM_FUSED=off: A/B knobs for the chunk
    # kernel's factor-stream form and the fused termination reductions.
    # OSQP_CT: termination cadence — ADMM residuals OSCILLATE around the
    # tolerance, so the cadence sets executed iterations directly
    # (measured on this class: ct=1→29, ct=3→30, ct=5→35, ct=15→45
    # executed).  With emit_term the check itself is ~free (it rides the
    # chunk's final backward pass), so the small cadence wins ~30%.
    # Round-2 TPU sweep under hrec (ms/batch at 1024): ct=1→14.2,
    # ct=2→11.8, ct=3→13.1, ct=5→13.1 — ct=2 balances per-chunk fixed
    # cost against oscillation-driven extra iterations; default 2.
    # scaling=3: exact-count sweeps show 3 Ruiz iterations equilibrate as
    # well as 5 or 10 on this class (27/29 iters at batch 1024, BASELINE.md
    # sweep table) at ~60% of the Ruiz kernel cost.
    settings = dataclasses.replace(
        admm.Settings(), rho=float(os.environ.get("OSQP_RHO0", "0.04")),
        check_termination=int(os.environ.get("OSQP_CT", "2")),
        adaptive_rho_interval=45,
        scaling=int(os.environ.get("OSQP_SCALING", "3")),
        alpha=float(os.environ.get("OSQP_ALPHA", "1.6")),
        factor_form=os.environ.get("OSQP_FACTOR_FORM", "hrec"),
        term_fused=os.environ.get("OSQP_TERM_FUSED", "auto"),
        # Cold solves of this class never finish before iteration 22
        # (exact-count sweeps), and the ct=3 cadence first checks at 21/24
        # anyway — one unchecked warmup chunk skips the first 7 chunks'
        # fixed costs without changing any termination decision.
        termination_warmup=int(os.environ.get("OSQP_WARMUP", "21")),
    )
    log(f"settings: factor_form={settings.factor_form} "
        f"term_fused={settings.term_fused} ct={settings.check_termination} "
        f"rho0={settings.rho} alpha={settings.alpha} "
        f"warmup={settings.termination_warmup}")

    # NOTE: synchronization is via a scalar readback (jnp.sum) rather than
    # block_until_ready — the latter is unreliable on tunneled platforms.
    def sync(a):
        return float(jnp.sum(a))

    def measure(qps, label, reps=10):
        @jax.jit
        def solve_all(qps):
            res = solve_batched_lane(qps, settings)
            return res.x, res.status, res.iterations, res.prim_res, res.dual_res

        t0 = time.time()
        x, status, iters, pr, dr = solve_all(qps)
        sync(x)
        log(f"[{label}] compile+first run: {time.time() - t0:.2f}s")
        n_opt = int(np.sum(np.asarray(status) == 0))
        med_iters = int(np.median(iters))
        log(
            f"[{label}] optimal: {n_opt}/{BATCH}  iters p50={med_iters} "
            f"max={int(np.max(iters))}  prim_res max={float(np.max(pr)):.2e}"
        )

        # Steady-state: `reps` back-to-back solves INSIDE one program, each
        # data-dependent on the previous (rho0 carries 0·Σx, opaque to the
        # compiler, exactly 0.0 in value) so no two solves can overlap or be
        # CSE'd.  Per-dispatch measurement is wrong on the tunneled platform:
        # every host dispatch/readback costs a ~25 ms round-trip, which
        # floored earlier rounds' numbers (r1 12.7k and the 22.6k interim
        # were tunnel-RT-bound, not device-bound).
        @jax.jit
        def solve_k(qps):
            def body(i, eps):
                res = solve_batched_lane(qps, settings, rho0=settings.rho + eps)
                return 0.0 * jnp.sum(res.x)

            return jax.lax.fori_loop(
                0, reps, body, jnp.asarray(0.0, qps.q_vec.dtype)
            )

        eps = solve_k(qps)
        sync(eps)  # compile + warm
        t0 = time.time()
        sync(solve_k(qps))
        dt = (time.time() - t0) / reps
        log(f"[{label}] steady-state: {dt*1e3:.1f} ms/batch -> {n_opt/dt:.1f} QPs/s")
        return n_opt / dt, med_iters, dt

    t0 = time.time()
    honest = build_honest_batch(BATCH, W, N, dtype)
    sync(honest.ws_l)
    log(f"honest batch build: {time.time() - t0:.1f}s")
    honest_qps, honest_iters, honest_dt = measure(honest, "honest full-GOMP")

    box = build_box_batch(BATCH, W, N, dtype)
    box_qps, box_iters, _ = measure(box, "box-only (secondary)")

    # FLOP accounting for the factor-cached hot loop (per ADMM iteration per
    # problem): banded forward+backward substitution ≈ 2 · (3·B2²·W) flops
    # with B2 = 2N, plus the A/Aᵀ stencil matvecs (~6 flops per nnz).
    B2 = 2 * N
    nnz = (W - 1) * N * 3 + W * N + (W - 1) * N + (W - 2) * N * 2 + W * 3 * N + 2 * W * N
    flops_per_iter = 2 * 3 * B2 * B2 * W + 6 * nnz
    achieved = flops_per_iter * honest_iters * BATCH / honest_dt
    log(f"achieved factor+solve rate: {achieved/1e9:.1f} GFLOP/s "
        f"(sequential banded recurrence — latency-bound VPU work, not MXU)")

    # HBM bandwidth accounting (VERDICT r2 next #5): exact per-iteration
    # stream bytes of the fused chunk kernel (hrec form), enumerated from
    # the kernel's own fwd/bwd stream lists (ops/admm_fused.py
    # fwd_streams/bwd_streams) and the driver-side pack layouts:
    #   fwd:  chol(Tp) + plf(PNp) + coef(CRp) + q(2N) + rho(Rp) +
    #         state(SRp) read, w(2N) write;
    #   bwd:  chol + plf + coef + lu(2Rp) + rho + state read + w read,
    #         state write.
    # (emit_term's residual packs stream only on each chunk's final
    # iteration — amortized below over the cadence.)
    from osqp_solver_tpu.ops.admm_fused import (
        _coef_layout, _tri_maps, state_rows,
    )

    Rp = honest.rows_per_waypoint_padded
    _, _, CR, CRp = _coef_layout(honest)
    _, _, Tp = _tri_maps(B2)
    _, SRp = state_rows(honest)
    PNp = 8  # pad8(N): P-lower vel-diag pack rows
    elems_per_wp = (
        2 * Tp + 2 * PNp + 2 * CRp  # factor + P-lower + stencil, both passes
        + B2 + 2 * Rp               # q (fwd), rho (both)
        + 2 * SRp + SRp              # state read fwd+bwd, write bwd
        + 2 * B2 + 2 * Rp            # w write+read, lu (bwd)
        + (2 * 2 * Rp + PNp) / settings.check_termination  # term packs
    )
    bytes_per_iter = 4.0 * W * elems_per_wp  # f32
    achieved_bytes = bytes_per_iter * honest_iters * BATCH / honest_dt
    HBM_PEAK_V5E = 819e9  # bytes/s, TPU v5e (v5 lite) single chip
    hbm_fraction = achieved_bytes / HBM_PEAK_V5E
    log(
        f"chunk-kernel streams: {bytes_per_iter/1e3:.1f} KB/iteration/problem"
        f" -> achieved {achieved_bytes/1e9:.1f} GB/s = "
        f"{hbm_fraction:.2f}x of v5e HBM peak (819 GB/s); the residual "
        f"fraction is the Ruiz/factor kernels + per-chunk fixed costs "
        f"inside the same wall-clock, so this is a floor on total traffic"
    )

    # Flagship full-search secondary (round 5): the reference's complete
    # run(start, end) time-scaling semantics (gomp-solver.h:38-55) at STOCK
    # solver settings — the in-solver stall detector (Settings.stall_checks,
    # default ON) gives the no-knob rate (BASELINE.md round-5 A/B: 4,783 q/s
    # vs 460 with stall_checks=0, plans identical).  Guarded: a failure here
    # never takes down the headline metric.
    full_qps = full_iters_p50 = None
    try:
        from osqp_solver_tpu import GOMPSolver, constraints as C
        from osqp_solver_tpu.models import ur5e
        from osqp_solver_tpu.ops.status import ExitCode

        FB, FW, INF = 1024, 50, 1e30
        fsolver = GOMPSolver(
            max_waypoints=FW,
            time_step=0.1,
            settings=dataclasses.replace(
                admm.Settings(), rho=0.04, check_termination=3, scaling=3
            ),
            pos_con=C.in_range(N, -2 * np.pi, 2 * np.pi),
            vel_con=C.in_range(N, -np.pi, np.pi),
            acc_con=C.in_range(N, -800 * np.pi / 180, 800 * np.pi / 180),
            con_3d=C.Constraint(
                lower=np.array([-INF, -0.4, -INF]), upper=np.full(3, INF)
            ),
            obstacles=[],
            balls=[
                ur5e.make_ball("back6", 0.15),
                ur5e.make_ball("tool", 0.05, is_gripper=True),
            ],
            segments=10,
            dtype=dtype,
        )
        frng = np.random.default_rng(0)
        fstarts = 0.02 * frng.standard_normal((FB, N))
        fends = np.array([np.pi, 0, 0, 0, 0, 0.0])[None] + 0.02 * frng.standard_normal((FB, N))
        t0f = time.time()
        fout = fsolver.run_batch_padded(fstarts, fends)
        sync(fout[1])
        log(f"[full-search secondary] compile+first: {time.time() - t0f:.1f}s")
        n_opt = int(np.sum(np.asarray(fout[0]) == int(ExitCode.kOptimal)))
        t0f = time.time()
        fouts = [fsolver.run_batch_padded(fstarts, fends) for _ in range(3)]
        sync(fouts[-1][1])
        fdt = (time.time() - t0f) / 3
        full_qps = n_opt / fdt
        full_iters_p50 = int(np.median(np.asarray(fout[4])))
        log(
            f"[full-search secondary] optimal {n_opt}/{FB}, "
            f"{fdt*1e3:.1f} ms/batch -> {full_qps:.0f} full queries/s "
            f"at stock settings (stall detection, no max_iter knob)"
        )
    except Exception as e:  # pragma: no cover - diagnostics only
        log(f"full-search secondary skipped: {type(e).__name__}: {e}")

    north_star_per_chip = 10000.0 / 8.0
    print(
        json.dumps(
            {
                "metric": "honest_trajectory_qps_per_sec_per_chip",
                "value": round(honest_qps, 2),
                "unit": (
                    "QPs/s (100-waypoint 6-DOF UR5e, 2-ball workspace+obstacle "
                    "rows, OSQP 1e-3 accuracy)"
                ),
                "vs_baseline": round(honest_qps / north_star_per_chip, 4),
                "secondary_box_only_qps_per_sec": round(box_qps, 2),
                "secondary_full_timescaling_queries_per_sec_stock": (
                    # `is not None`: a measured 0.0 (total planner
                    # regression) must stay distinguishable from "skipped"
                    round(full_qps, 1) if full_qps is not None else None
                ),
                "full_search_admm_iters_p50": full_iters_p50,
                "median_iterations": honest_iters,
                "factor_solve_gflops": round(achieved / 1e9, 1),
                "achieved_gbps": round(achieved_bytes / 1e9, 1),
                "hbm_fraction": round(hbm_fraction, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
