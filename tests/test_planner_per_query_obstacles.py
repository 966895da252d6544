"""Per-query obstacles in the batched planner paths.

Round-5 extension beyond the reference (which owns one obstacle set per
``GOMPSolver`` instance, ``gomp-solver.h:30-36``): ``run_batch`` /
``run_batch_lane`` / ``run_batch_padded`` (+ the ``_sharded`` variants)
accept ``obstacles=[stack_obstacles([...B...]), ...]`` — obstacle pytrees
whose leaves carry a leading ``(B,)`` per-problem axis — so a fleet where
EVERY query has its own keep-out poses plans inside one compiled program
(leaf values are traced inputs: moving an obstacle never recompiles).

Pinned here: replicated per-query obstacles match the shared-obstacle
paths exactly; distinct per-query obstacles steer each query around its
OWN keep-out; the sharded wrappers shard per-query obstacles with their
queries; and the argument validation fails fast.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from osqp_solver_tpu import RobotBall, constraints as C
from osqp_solver_tpu.gomp.geometry import (
    HorizontalLine,
    SphereObstacle,
    stack_obstacles,
)
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


SPHERE = SphereObstacle.create([0.5, 0.25, -0.125], radius=0.15)


def queries(B):
    rng = np.random.default_rng(42)
    starts = 0.1 * rng.standard_normal((B, N))
    ends = np.array([1.0, 0.5, -0.25]) + 0.1 * rng.standard_normal((B, N))
    return starts, ends


def test_lane_replicated_matches_shared():
    """The same sphere stacked B times == the constructor-obstacle path,
    query for query (statuses, SCP iters, trajectories)."""
    B = 4
    starts, ends = queries(B)
    s = make_solver([SPHERE])
    st0, tr0, it0 = s.run_batch_lane(starts, ends, waypoints=12)
    st1, tr1, it1 = s.run_batch_lane(
        starts, ends, waypoints=12, obstacles=[stack_obstacles([SPHERE] * B)]
    )
    np.testing.assert_array_equal(np.asarray(st0), np.asarray(st1))
    np.testing.assert_array_equal(np.asarray(it0), np.asarray(it1))
    np.testing.assert_allclose(
        np.asarray(tr0), np.asarray(tr1), atol=1e-8
    )


def test_vmap_batch_replicated_matches_shared():
    B = 3
    starts, ends = queries(B)
    line = HorizontalLine.create([0, 1], [0.5, 0.0, 0.4], False)
    s = make_solver([line])
    st0, tr0, _ = s.run_batch(starts, ends, waypoints=10)
    st1, tr1, _ = s.run_batch(
        starts, ends, waypoints=10, obstacles=[stack_obstacles([line] * B)]
    )
    np.testing.assert_array_equal(np.asarray(st0), np.asarray(st1))
    np.testing.assert_allclose(np.asarray(tr0), np.asarray(tr1), atol=1e-8)


def test_padded_distinct_spheres_each_query_detours_its_own():
    """Same (start, end) for every query, a DIFFERENT sphere per query on
    the straight-line path: every optimal plan clears its OWN keep-out, and
    queries with different spheres produce different trajectories."""
    B = 4
    start = np.zeros(N)
    end = np.array([1.0, 0.5, -0.25])
    starts = np.tile(start, (B, 1))
    ends = np.tile(end, (B, 1))
    # Spheres centered ON the straight path at different parameters, so
    # each query must bulge at a different place.
    centers = [start + t * (end - start) for t in (0.3, 0.45, 0.6, 0.75)]
    spheres = [SphereObstacle.create(c, radius=0.12) for c in centers]
    s = make_solver([SPHERE], waypoints=14, segments=2)
    statuses, trajs, horizons, rounds, iters = s.run_batch_padded(
        starts, ends, obstacles=[stack_obstacles(spheres)]
    )
    st = np.asarray(statuses)
    assert (st == int(ExitCode.kOptimal)).all(), st
    W = 14
    r_ball = 0.05
    for b in range(B):
        w = int(np.asarray(horizons)[b])
        q = np.asarray(trajs[b][: W * N]).reshape(W, N)[:w]
        d = np.linalg.norm(q - centers[b], axis=-1)
        assert d.min() >= 0.12 + r_ball - 2e-3, (b, d.min())
    # identical queries, different obstacles -> different plans
    t0 = np.asarray(trajs[0])
    assert any(
        float(np.max(np.abs(np.asarray(trajs[b]) - t0))) > 1e-3
        for b in range(1, B)
    )


def test_padded_replicated_matches_shared():
    B = 4
    starts, ends = queries(B)
    s = make_solver([SPHERE], waypoints=14, segments=2)
    o0 = s.run_batch_padded(starts, ends)
    o1 = s.run_batch_padded(
        starts, ends, obstacles=[stack_obstacles([SPHERE] * B)]
    )
    np.testing.assert_array_equal(np.asarray(o0[0]), np.asarray(o1[0]))
    np.testing.assert_array_equal(np.asarray(o0[2]), np.asarray(o1[2]))
    np.testing.assert_allclose(np.asarray(o0[1]), np.asarray(o1[1]), atol=1e-8)


def test_sharded_per_query_obstacles_match_single_device():
    """Per-query obstacles shard with their queries over the 8-device mesh:
    the sharded paths reproduce the single-device per-query results."""
    B = 8
    starts, ends = queries(B)
    rng = np.random.default_rng(7)
    spheres = [
        SphereObstacle.create(
            [0.5, 0.25, -0.125] + 0.05 * rng.standard_normal(3), radius=0.1
        )
        for _ in range(B)
    ]
    obs = [stack_obstacles(spheres)]
    s = make_solver([SPHERE], waypoints=12, segments=2)
    mesh = make_mesh()

    st0, tr0, it0 = s.run_batch_lane(starts, ends, waypoints=12, obstacles=obs)
    st1, tr1, it1 = s.run_batch_lane_sharded(
        starts, ends, waypoints=12, mesh=mesh, obstacles=obs
    )
    np.testing.assert_array_equal(np.asarray(st0), np.asarray(st1))
    np.testing.assert_array_equal(np.asarray(it0), np.asarray(it1))
    np.testing.assert_allclose(np.asarray(tr0), np.asarray(tr1), atol=1e-8)

    o0 = s.run_batch_padded(starts, ends, obstacles=obs)
    o1 = s.run_batch_padded_sharded(starts, ends, mesh=mesh, obstacles=obs)
    np.testing.assert_array_equal(np.asarray(o0[0]), np.asarray(o1[0]))
    np.testing.assert_array_equal(np.asarray(o0[2]), np.asarray(o1[2]))
    np.testing.assert_allclose(np.asarray(o0[1]), np.asarray(o1[1]), atol=1e-8)


def test_obstacles_arg_validation():
    B = 4
    starts, ends = queries(B)
    s = make_solver([SPHERE])
    # wrong obstacle count (row layout is static)
    with pytest.raises(ValueError, match="obstacle count"):
        s.run_batch_lane(starts, ends, waypoints=12, obstacles=[])
    # missing batch axis
    with pytest.raises(ValueError, match="leading batch"):
        s.run_batch_lane(starts, ends, waypoints=12, obstacles=[SPHERE])
    # batch axis of the wrong size
    with pytest.raises(ValueError, match="leading batch"):
        s.run_batch_lane(
            starts, ends, waypoints=12,
            obstacles=[stack_obstacles([SPHERE] * (B + 1))],
        )


def test_stack_obstacles_rejects_mixed_types():
    line = HorizontalLine.create([0, 1], [0.5, 0.0, 0.4], False)
    with pytest.raises(TypeError, match="one type"):
        stack_obstacles([SPHERE, line])
