"""CapsuleObstacle: the third duck-typed keep-out geometry.

A capsule (cylinder with hemispherical caps around an axis segment) joins
``HorizontalLine`` (the reference's geometry, ``horizontal-line.h``) and
``SphereObstacle`` under the same protocol (``violates`` +
``linearize_rows``) and the same between-waypoint tunneling discipline
(``horizontal-line.h:78-92`` anchor), sharing the sphere's SCP cut
construction (``geometry._keepout_cut_rows``).  Pinned here: the
segment-segment closest-approach geometry, waypoint + tunneling violation
detection, end-to-end SCP detours in the planner, and per-query batching
via ``stack_obstacles``.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from osqp_solver_tpu import RobotBall, constraints as C
from osqp_solver_tpu.gomp.geometry import CapsuleObstacle, stack_obstacles
from osqp_solver_tpu.gomp.planner import GOMPSolver
from osqp_solver_tpu.ops.status import ExitCode

pytestmark = pytest.mark.quick

N = 3


def identity_ball(radius=0.05, gripper=True):
    return RobotBall(
        fk=lambda s: s,
        jacobian=lambda s: jnp.eye(3, dtype=s.dtype),
        radius=radius,
        is_gripper=gripper,
    )


def make_solver(obstacles=(), waypoints=10, **kw):
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


def test_point_distance_and_axis_closest():
    cap = CapsuleObstacle.create([0, 0, 0], [1, 0, 0], radius=0.2)
    # beside the shaft: perpendicular distance
    np.testing.assert_allclose(
        float(cap.distance(jnp.array([0.5, 0.3, 0.0]))), 0.3, atol=1e-12
    )
    # beyond the caps: distance to the endpoint
    np.testing.assert_allclose(
        float(cap.distance(jnp.array([1.4, 0.3, 0.0]))),
        np.hypot(0.4, 0.3), atol=1e-12,
    )
    c = np.asarray(cap.axis_closest(jnp.array([-2.0, 1.0, 0.0])))
    np.testing.assert_allclose(c, [0, 0, 0], atol=1e-12)


def test_segment_segment_closest():
    cap = CapsuleObstacle.create([0, 0, 0], [1, 0, 0], radius=0.2)
    # trajectory segment crossing perpendicular over the shaft at x=0.5,
    # height z=0.4: closest approach 0.4 at the crossing point
    pts = jnp.array([[0.5, -1.0, 0.4], [0.5, 1.0, 0.4]])
    rel, d, t = cap.segment_closest(pts)
    np.testing.assert_allclose(float(d[0]), 0.4, atol=1e-9)
    np.testing.assert_allclose(float(t[0]), 0.5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(rel[0]), [0, 0, 0.4], atol=1e-9)
    # segment entirely beyond the cap end: corner-region solution
    pts = jnp.array([[2.0, -1.0, 0.0], [2.0, 1.0, 0.0]])
    rel, d, t = cap.segment_closest(pts)
    np.testing.assert_allclose(float(d[0]), 1.0, atol=1e-9)  # to (1,0,0)
    # parallel segments: flat direction — any minimizer gives the distance
    pts = jnp.array([[0.2, 0.0, 0.5], [0.8, 0.0, 0.5]])
    _, d, _ = cap.segment_closest(pts)
    np.testing.assert_allclose(float(d[0]), 0.5, atol=1e-9)


def test_violates_waypoint_and_tunneling():
    cap = CapsuleObstacle.create([0, -1, 0], [0, 1, 0], radius=0.2)
    r = 0.05
    # waypoint inside the inflated radius
    assert bool(cap.violates(jnp.array([[0.2, 0.0, 0.0]]), r)[0])
    # clear waypoint
    assert not bool(cap.violates(jnp.array([[0.5, 0.0, 0.0]]), r)[0])
    # tunneling: both waypoints clear, the segment between them crosses the
    # shaft — flagged on both endpoints
    traj = jnp.array([[-0.5, 0.0, 0.0], [0.5, 0.0, 0.0]])
    v = np.asarray(cap.violates(traj, r))
    assert v.all(), v
    # the same hop ABOVE the capsule (z=0.5) is clear
    traj_hi = jnp.array([[-0.5, 0.0, 0.5], [0.5, 0.0, 0.5]])
    assert not np.asarray(cap.violates(traj_hi, r)).any()


def test_capsule_obstacle_avoidance_scp():
    """A capsule across the straight-line path: the plan detours until
    waypoints AND segments clear the keep-out (exact-FK audit)."""
    cap = CapsuleObstacle.create(
        [0.25, -1.0, 0.2], [0.25, 1.0, 0.2], radius=0.25, margin=0.2
    )
    r_ball = 0.05
    solver = make_solver(obstacles=[cap], waypoints=10)
    start = np.array([-0.5, 0.0, 0.2])
    end = np.array([1.0, 0.0, 0.2])
    res = solver.run(start, end)
    assert res.status == ExitCode.kOptimal
    W = res.trajectory.size // (2 * N)
    q = res.trajectory[: W * N].reshape(W, N)
    assert not np.asarray(cap.violates(jnp.asarray(q), r_ball)).any()
    _, seg_d, _ = cap.segment_closest(jnp.asarray(q))
    assert float(np.min(np.asarray(seg_d))) >= 0.25 + r_ball - 1.5e-3
    # the straight line genuinely crosses the capsule
    lin = np.linspace(start, end, W)
    assert np.asarray(cap.violates(jnp.asarray(lin), r_ball)).any()


def test_capsule_batched_and_per_query():
    """Capsules ride the batched planner paths and stack per-query like any
    obstacle: replicated per-query == shared, and each query detours its
    own capsule."""
    cap = CapsuleObstacle.create(
        [0.25, -1.0, 0.2], [0.25, 1.0, 0.2], radius=0.2, margin=0.2
    )
    s = make_solver(obstacles=[cap], waypoints=10)
    B = 3
    rng = np.random.default_rng(3)
    starts = np.tile([-0.5, 0.0, 0.2], (B, 1)) + 0.05 * rng.standard_normal((B, N))
    ends = np.tile([1.0, 0.0, 0.2], (B, 1)) + 0.05 * rng.standard_normal((B, N))
    st0, tr0, _ = s.run_batch_lane(starts, ends, waypoints=10)
    st1, tr1, _ = s.run_batch_lane(
        starts, ends, waypoints=10, obstacles=[stack_obstacles([cap] * B)]
    )
    np.testing.assert_array_equal(np.asarray(st0), np.asarray(st1))
    np.testing.assert_allclose(np.asarray(tr0), np.asarray(tr1), atol=1e-8)
    assert (np.asarray(st0) == int(ExitCode.kOptimal)).any()
    # each optimal plan clears its own keep-out
    W = 10
    r_ball = 0.05
    for b in range(B):
        if int(st0[b]) != int(ExitCode.kOptimal):
            continue
        q = np.asarray(tr0[b][: W * N]).reshape(W, N)
        assert not np.asarray(cap.violates(jnp.asarray(q), r_ball)).any()
