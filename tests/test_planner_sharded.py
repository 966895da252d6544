"""Planner-layer DP scale-out (VERDICT r4 next #1).

The production planner surfaces — ``run_batch_lane`` (fixed horizon) and
``run_batch_padded`` (the flagship full time-scaling search) — shard their
query batch over the mesh batch axis with ``shard_map``
(``GOMPSolver.run_batch_lane_sharded`` / ``run_batch_padded_sharded``):
each device runs the whole masked SCP/descent program for its shard, zero
collectives inside (queries are independent — one solver per problem in the
reference, ``/root/reference/src/gomp-solver.h:61-64``; SURVEY.md §2.3 DP
row).  These tests pin parity against the single-device paths on the
8-device CPU mesh.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from osqp_solver_tpu import RobotBall, constraints as C
from osqp_solver_tpu.gomp.geometry import HorizontalLine
from osqp_solver_tpu.gomp.planner import GOMPSolver
from osqp_solver_tpu.ops.status import ExitCode
from osqp_solver_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.quick

N = 3


def identity_ball(radius=0.05, gripper=True):
    return RobotBall(
        fk=lambda s: s,
        jacobian=lambda s: jnp.eye(3, dtype=s.dtype),
        radius=radius,
        is_gripper=gripper,
    )


def make_solver(obstacles=(), waypoints=12, **kw):
    return GOMPSolver(
        max_waypoints=waypoints,
        time_step=0.1,
        pos_con=C.in_range(N, -10, 10),
        vel_con=C.in_range(N, -20, 20),
        acc_con=C.in_range(N, -40, 40),
        con_3d=C.in_range(3, -10, 10),
        obstacles=list(obstacles),
        balls=[identity_ball()],
        **kw,
    )


def queries(B):
    rng = np.random.default_rng(42)
    starts = 0.1 * rng.standard_normal((B, N))
    ends = np.array([1.0, 0.5, -0.25]) + 0.1 * rng.standard_normal((B, N))
    return starts, ends


def test_run_batch_padded_sharded_matches_single_device():
    """Full time-scaling search on the 8-device mesh == single-device path:
    statuses/horizons/telemetry equal, trajectories equal to fp tolerance
    (shard shapes may reorder XLA:CPU vector lanes)."""
    line = HorizontalLine.create([1.0, 0.0], [0.0, 0.0, 0.5], False)
    solver = make_solver(obstacles=[line], waypoints=12, segments=3)
    starts, ends = queries(16)
    mesh = make_mesh(batch=8, horizon=1)

    st0, tr0, hz0, scp0, it0 = solver.run_batch_padded(starts, ends)
    st1, tr1, hz1, scp1, it1 = solver.run_batch_padded_sharded(
        starts, ends, mesh
    )
    np.testing.assert_array_equal(np.asarray(st0), np.asarray(st1))
    np.testing.assert_array_equal(np.asarray(hz0), np.asarray(hz1))
    np.testing.assert_array_equal(np.asarray(scp0), np.asarray(scp1))
    np.testing.assert_array_equal(np.asarray(it0), np.asarray(it1))
    np.testing.assert_allclose(
        np.asarray(tr0), np.asarray(tr1), atol=1e-8, rtol=0
    )
    # the workload must exercise both outcomes for the parity to mean much
    assert int(np.sum(np.asarray(st0) == ExitCode.kOptimal)) >= 4


def test_run_batch_lane_sharded_matches_single_device():
    solver = make_solver(waypoints=10)
    starts, ends = queries(8)
    mesh = make_mesh(batch=8, horizon=1)

    st0, tr0, k0 = solver.run_batch_lane(starts, ends, 10)
    st1, tr1, k1 = solver.run_batch_lane_sharded(starts, ends, 10, mesh)
    np.testing.assert_array_equal(np.asarray(st0), np.asarray(st1))
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))
    np.testing.assert_allclose(
        np.asarray(tr0), np.asarray(tr1), atol=1e-8, rtol=0
    )


def test_run_batch_padded_sharded_mixed_outcomes():
    """Per-shard masked descent handles heterogeneous batches: queries that
    plan and queries that cannot (endpoint outside the position box ⇒ the
    pinned-endpoint rows are infeasible) coexist on the mesh with the same
    statuses as the single-device path."""
    solver = make_solver(waypoints=8, segments=2)
    starts, ends = queries(8)
    ends[1] = 50.0  # outside pos_con ⇒ infeasible everywhere
    ends[5] = -50.0
    mesh = make_mesh(batch=8, horizon=1)
    st0, _, hz0, _, _ = solver.run_batch_padded(starts, ends)
    st1, _, hz1, _, _ = solver.run_batch_padded_sharded(starts, ends, mesh)
    np.testing.assert_array_equal(np.asarray(st0), np.asarray(st1))
    np.testing.assert_array_equal(np.asarray(hz0), np.asarray(hz1))
    assert int(np.asarray(st0)[1]) != ExitCode.kOptimal
    assert int(np.asarray(st0)[0]) == ExitCode.kOptimal


def test_sharded_planner_compiles_zero_collectives():
    """The DP scale-out claim, pinned at the HLO level: the compiled
    sharded planner programs contain NO cross-device collectives — each
    device plans its query shard fully locally (one solver per problem,
    ``gomp-solver.h:61-64``), so scaling is communication-free by
    construction (the planner analogue of ``test_banded``'s
    separator-only payload pin)."""
    import re

    import jax
    from jax.sharding import PartitionSpec

    from osqp_solver_tpu.parallel.mesh import BATCH_AXIS

    s = make_solver(waypoints=10, segments=2)
    B = 8
    starts, ends = queries(B)
    mesh = make_mesh()
    spec = PartitionSpec(BATCH_AXIS)
    collective_ops = (
        "all-gather", "all-reduce", "collective-permute", "all-to-all",
        "reduce-scatter",
    )
    for name, program, n_out in (
        ("lane", s._plan_batch_lane_program(10, s.max_scp_iterations), 3),
        ("padded", s._plan_batch_padded_program(s.max_scp_iterations, False), 5),
    ):
        fn = jax.jit(jax.shard_map(
            program, mesh=mesh, in_specs=(spec, spec, spec),
            out_specs=(spec,) * n_out, check_vma=False,
        ))
        hlo = fn.lower(
            jnp.asarray(starts, s.dtype), jnp.asarray(ends, s.dtype), []
        ).compile().as_text()
        found = [
            op for op in collective_ops
            if re.search(rf"\b{op}\(", hlo) or re.search(rf"= {op}", hlo)
        ]
        assert not found, (name, found)
