"""Constraint-assembly unit tests.

Pytest mirror of the reference gtest suite
(``/root/reference/tests/test.cpp``, 449 LoC): same tiny problems, same
hand-written expected rows, fake analytic FK/Jacobians standing in for the
robot library.  The reference's accidental trailing-comma defects in the
``acceleration``/``all`` tests (``test.cpp:199-201, 227-239``) are *not*
replicated — expected values follow the clear intent.
"""
import numpy as np
import pytest

from osqp_solver_tpu import ConstraintBuilder, RobotBall, constraints as C
from osqp_solver_tpu.gomp.geometry import HorizontalLine
from osqp_solver_tpu.gomp.layout import make_layout


# Row-index helpers mirroring test.cpp:25-43.
def first_position_row(w, d):
    return (w - 1) * d


def first_velocity_row(w, d):
    return first_position_row(w, d) + w * d


def first_acceleration_row(w, d):
    return first_velocity_row(w, d) + (w - 1) * d


def first_3d_position_row(w, d):
    return first_acceleration_row(w, d) + (w - 2) * d


def n_vars(w, d):
    return 2 * w * d


def test_linking_velocity_to_position():
    """Dynamics rows v_i - q_{i+1} + q_i = 0 occupy the first (W-1)*N rows
    (test.cpp:45-80)."""
    d, w = 2, 3
    l, A, u = ConstraintBuilder(w, d).build()

    expected_A = np.array(
        [
            [1, 0, -1, 0, 0, 0, 1, 0, 0, 0, 0, 0],
            [0, 1, 0, -1, 0, 0, 0, 1, 0, 0, 0, 0],
            [0, 0, 1, 0, -1, 0, 0, 0, 1, 0, 0, 0],
            [0, 0, 0, 1, 0, -1, 0, 0, 0, 1, 0, 0],
        ],
        dtype=float,
    )
    rows = (w - 1) * d
    np.testing.assert_allclose(A[:rows], expected_A)
    np.testing.assert_allclose(l[:rows], 0.0)
    np.testing.assert_allclose(u[:rows], 0.0)


def test_indices():
    """Variable-index arithmetic (test.cpp:102-122)."""
    lay = make_layout(3, 2)
    assert [lay.nth_pos(i) for i in range(3)] == [0, 2, 4]
    assert [lay.nth_velocity(i) for i in range(2)] == [6, 8]
    lay4 = make_layout(4, 2)
    assert lay4.nth_acceleration(0) == 14
    assert lay4.nth_acceleration(1) == 16


def test_joint_position():
    """Position box rows (test.cpp:124-157)."""
    d, w = 2, 3
    l, A, u = (
        ConstraintBuilder(w, d)
        .positions(0, w - 1, C.in_range(d, [1, 2], [3, 4]))
        .build()
    )
    r0 = first_position_row(w, d)
    rows = w * d
    expected_A = np.zeros((rows, n_vars(w, d)))
    expected_A[np.arange(rows), np.arange(rows)] = 1.0
    np.testing.assert_allclose(A[r0 : r0 + rows], expected_A)
    np.testing.assert_allclose(l[r0 : r0 + rows], [1, 2, 1, 2, 1, 2])
    np.testing.assert_allclose(u[r0 : r0 + rows], [3, 4, 3, 4, 3, 4])


def test_velocity():
    """Velocity box rows (test.cpp:159-190)."""
    d, w = 2, 3
    l, A, u = (
        ConstraintBuilder(w, d)
        .velocities(0, w - 2, C.in_range(d, [1, 2], [3, 4]))
        .build()
    )
    r0 = first_velocity_row(w, d)
    rows = (w - 1) * d
    expected_A = np.zeros((rows, n_vars(w, d)))
    expected_A[np.arange(rows), w * d + np.arange(rows)] = 1.0
    np.testing.assert_allclose(A[r0 : r0 + rows], expected_A)
    np.testing.assert_allclose(l[r0 : r0 + rows], [1, 2, 1, 2])
    np.testing.assert_allclose(u[r0 : r0 + rows], [3, 4, 3, 4])


def test_acceleration():
    """Acceleration rows l <= v_{t+1} - v_t <= u (intent of test.cpp:184-210)."""
    d, w = 2, 3
    l, A, u = (
        ConstraintBuilder(w, d)
        .accelerations(0, w - 3, C.in_range(d, [1, 2], [3, 4]))
        .build()
    )
    r0 = first_acceleration_row(w, d)
    expected_A = np.array(
        [
            [0, 0, 0, 0, 0, 0, -1, 0, 1, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, -1, 0, 1, 0, 0],
        ],
        dtype=float,
    )
    np.testing.assert_allclose(A[r0 : r0 + 2], expected_A)
    np.testing.assert_allclose(l[r0 : r0 + 2], [1, 2])
    np.testing.assert_allclose(u[r0 : r0 + 2], [3, 4])


def test_all_constraint_kinds_together():
    """Combined position/velocity/acceleration rows (intent of
    test.cpp:212-248)."""
    d, w = 2, 3
    l, A, u = (
        ConstraintBuilder(w, d)
        .positions(0, w - 1, C.in_range(d, [1, 2], [3, 4]))
        .velocities(0, w - 2, C.in_range(d, [5, 6], [7, 8]))
        .accelerations(0, w - 3, C.in_range(d, [9, 10], [11, 12]))
        .build()
    )
    r0 = first_position_row(w, d)
    np.testing.assert_allclose(
        l[r0 : r0 + 12], [1, 2, 1, 2, 1, 2, 5, 6, 5, 6, 9, 10]
    )
    np.testing.assert_allclose(
        u[r0 : r0 + 12], [3, 4, 3, 4, 3, 4, 7, 8, 7, 8, 11, 12]
    )
    # Identity rows for boxes, difference rows for accelerations.
    expected_A = np.zeros((12, n_vars(w, d)))
    expected_A[np.arange(10), np.arange(10)] = 1.0
    expected_A[10, 6], expected_A[10, 8] = -1.0, 1.0
    expected_A[11, 7], expected_A[11, 9] = -1.0, 1.0
    np.testing.assert_allclose(A[r0 : r0 + 12], expected_A)


CONST_JAC = np.arange(9, dtype=float).reshape(3, 3)  # test.cpp:258-269


def _ball(fk, jac=None, radius=0.0, is_gripper=True):
    return RobotBall(
        fk=fk,
        jacobian=(jac if jac is not None else (lambda q: CONST_JAC)),
        radius=radius,
        is_gripper=is_gripper,
    )


def test_position3d_stateful_fk():
    """SCP linearization with the powers-of-two stateful FK encoding call
    order (test.cpp:250-303): bounds are con3d - p + J·q0 (radius 0)."""
    d, w = 3, 2
    counter = {"n": 0}

    def pow2_fk(q):
        c = counter["n"]
        counter["n"] += 3
        return np.array([2.0 ** c, 2.0 ** (c + 1), 2.0 ** (c + 2)])

    trajectory = np.ones(w * d * 2)
    l, A, u = (
        ConstraintBuilder(w, d, balls=[_ball(pow2_fk)])
        .with_obstacles(C.in_range(3, [11, 22, 33], [44, 55, 66]), trajectory)
        .build()
    )
    r0 = first_3d_position_row(w, d)
    expected_A = np.zeros((6, n_vars(w, d)))
    expected_A[0:3, 0:3] = CONST_JAC
    expected_A[3:6, 3:6] = CONST_JAC
    np.testing.assert_allclose(A[r0 : r0 + 6], expected_A)

    low = np.array([11 + 3, 22 + 12, 33 + 21], dtype=float)  # con3d + J·1
    upp = np.array([44 + 3, 55 + 12, 66 + 21], dtype=float)
    fk_vals = np.array([1, 2, 4, 8, 16, 32], dtype=float)
    np.testing.assert_allclose(l[r0 : r0 + 6], np.tile(low, 2) - fk_vals)
    np.testing.assert_allclose(u[r0 : r0 + 6], np.tile(upp, 2) - fk_vals)


def test_position3d_identity_fk():
    """test.cpp:305-358: identity FK, constant Jacobian."""
    d, w = 3, 2
    trajectory = np.ones(w * d * 2)
    l, A, u = (
        ConstraintBuilder(w, d, balls=[_ball(lambda q: np.asarray(q, dtype=float))])
        .with_obstacles(C.in_range(3, [11, 22, 33], [44, 55, 66]), trajectory)
        .build()
    )
    r0 = first_3d_position_row(w, d)
    low = np.array([11 - 1 + 3, 22 - 1 + 12, 33 - 1 + 21], dtype=float)
    upp = np.array([44 - 1 + 3, 55 - 1 + 12, 66 - 1 + 21], dtype=float)
    np.testing.assert_allclose(l[r0 : r0 + 6], np.tile(low, 2))
    np.testing.assert_allclose(u[r0 : r0 + 6], np.tile(upp, 2))


POW2_JAC = np.array([[0, 1, 2], [4, 8, 16], [32, 64, 128]], dtype=float)


def test_position3d_jac_pow2():
    """test.cpp:360-401: powers-of-two Jacobian, trajectory of 2s."""
    d, w = 3, 2
    trajectory = np.full(w * d * 2, 2.0)
    l, A, u = (
        ConstraintBuilder(
            w, d, balls=[_ball(lambda q: np.asarray(q, dtype=float), lambda q: POW2_JAC)]
        )
        .with_obstacles(C.in_range(3, [11, 22, 33], [44, 55, 66]), trajectory)
        .build()
    )
    r0 = first_3d_position_row(w, d)
    low = np.array([11 - 2 + 6, 22 - 2 + 56, 33 - 2 + 448], dtype=float)
    upp = np.array([44 - 2 + 6, 55 - 2 + 56, 66 - 2 + 448], dtype=float)
    np.testing.assert_allclose(l[r0 : r0 + 6], np.tile(low, 2))
    np.testing.assert_allclose(u[r0 : r0 + 6], np.tile(upp, 2))


def test_ignore_velocity_trajectory():
    """Linearization reads only the position half of the trajectory vector
    (test.cpp:403-448)."""
    d, w = 3, 2
    trajectory = np.concatenate([np.full(w * d, 2.0), np.full(w * d, 1024.0)])
    l, A, u = (
        ConstraintBuilder(
            w, d, balls=[_ball(lambda q: np.asarray(q, dtype=float), lambda q: POW2_JAC)]
        )
        .with_obstacles(C.in_range(3, [11, 22, 33], [44, 55, 66]), trajectory)
        .build()
    )
    r0 = first_3d_position_row(w, d)
    low = np.array([11 - 2 + 6, 22 - 2 + 56, 33 - 2 + 448], dtype=float)
    upp = np.array([44 - 2 + 6, 55 - 2 + 56, 66 - 2 + 448], dtype=float)
    np.testing.assert_allclose(l[r0 : r0 + 6], np.tile(low, 2))
    np.testing.assert_allclose(u[r0 : r0 + 6], np.tile(upp, 2))


def test_radius_tightens_bounds():
    """Workspace bounds are tightened by ±radius (constraint-builder.h:269-281)."""
    d, w = 3, 2
    trajectory = np.zeros(w * d * 2)
    fk = lambda q: np.zeros(3)
    l, A, u = (
        ConstraintBuilder(w, d, balls=[_ball(fk, radius=0.25)])
        .with_obstacles(C.in_range(3, [0, 0, 0], [10, 10, 10]), trajectory)
        .build()
    )
    r0 = first_3d_position_row(w, d)
    np.testing.assert_allclose(l[r0 : r0 + 3], 0.25)
    np.testing.assert_allclose(u[r0 : r0 + 3], 10 - 0.25)


def test_obstacle_rows_collision_and_dummy():
    """Obstacle Z-rows: collision gets a real one-sided bound, no collision a
    dummy row with the same J_z coefficients and infinite bounds
    (constraint-builder.h:108-117, 246-267)."""
    d, w = 3, 4
    line = HorizontalLine.create([1, 0], [0, 0, 0.5], bypass_from_below=False)
    # Identity FK: waypoint 1 sits near the line in XY (y=0 line along x).
    traj_q = np.array(
        [[0, 5, 0], [0, 0.05, 0], [0, 5, 0], [0, 5, 0]], dtype=float
    )
    trajectory = np.concatenate([traj_q.reshape(-1), np.zeros(w * d)])
    ball = _ball(
        lambda q: np.asarray(q, dtype=float), lambda q: POW2_JAC, radius=0.1,
        is_gripper=False,
    )
    builder = ConstraintBuilder(w, d, balls=[ball], obstacles=[line])
    l, A, u = builder.with_obstacles(C.any_constraint(3), trajectory).build()

    lay = builder.layout
    rows = [lay.workspace_row(0, t, 0) for t in range(w)]
    # All rows (real and dummy) carry J_z coefficients on q_t.
    for t, r in enumerate(rows):
        np.testing.assert_allclose(A[r, t * d : (t + 1) * d], POW2_JAC[2])
    # Waypoint 1 collides (XY distance 0.05 < 0.1): bypass-from-above =>
    # lower bound = line_z - p_z + J_z·q (+radius).
    p1 = traj_q[1]
    expected_low = 0.5 - p1[2] + POW2_JAC[2] @ p1 + 0.1
    assert l[rows[1]] == pytest.approx(expected_low)
    assert u[rows[1]] >= C.INF_THRESHOLD
    # Waypoints 0 and 3 are clear on both adjacent segments... waypoint 0's
    # segment to waypoint 1 does not cross (same side), so dummy bounds.
    assert l[rows[3]] <= -C.INF_THRESHOLD and u[rows[3]] >= C.INF_THRESHOLD


def test_row_count_matches_reference_overallocation():
    """Total row count reproduces constraint-builder.h:43-44 exactly."""
    d, w = 6, 10
    lay = make_layout(w, d, gripper_flags=[False, True], n_obstacles=2)
    expected = (w - 1) * d + d * (w + w - 1 + w - 2 + w * (3 + 2 * 2))
    assert lay.n_rows == expected

pytestmark = pytest.mark.quick  # fast tier: see CLAUDE.md
