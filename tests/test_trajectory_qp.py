"""Structured TrajectoryQP vs. dense ConstraintBuilder parity.

The structured container must agree element-for-element with the dense
reference-mirroring builder (modulo the inert over-allocated padding rows,
see trajectory_qp.py docstring), and the ADMM core must produce the same
solution through either representation.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osqp_solver_tpu import ConstraintBuilder, RobotBall, constraints as C
from osqp_solver_tpu.gomp.geometry import HorizontalLine, SphereObstacle
from osqp_solver_tpu.gomp.trajectory import smoothness_objective
from osqp_solver_tpu.gomp.trajectory_qp import (
    empty_trajectory_qp,
    linearize_workspace,
    with_gomp_boxes,
    smoothness_P_blocks,
)
from osqp_solver_tpu.ops import admm
from osqp_solver_tpu.ops.qp import DenseQP
from osqp_solver_tpu.ops.status import ExitCode
from osqp_solver_tpu.ops.tridiag import block_tridiag_to_dense

# Mid tier: solver+planner integration paths the quick tier skips
# (pyproject `mid` marker; see CLAUDE.md).
pytestmark = pytest.mark.mid

W, N = 6, 3
RNG = np.random.default_rng(42)
JACS = RNG.normal(size=(2, W, 3, N))  # fake per-waypoint jacobians per ball
OFFS = RNG.normal(size=(2, 3))


def fk_fn(b):
    return lambda s: jnp.asarray(OFFS[b]) + 0.1 * jnp.array(
        [jnp.sum(s), jnp.sum(s**2), s[0]]
    )


def jac_fn(b):
    # Waypoint-dependent via hash of q is not traceable; use constant per ball.
    return lambda s: jnp.asarray(JACS[b, 0]) + 0.01 * s[None, :]


def make_balls():
    return (
        RobotBall(fk=fk_fn(0), jacobian=jac_fn(0), radius=0.15, is_gripper=False),
        RobotBall(fk=fk_fn(1), jacobian=jac_fn(1), radius=0.05, is_gripper=True),
    )


def make_problem(with_obstacles=True, feasible=False):
    """Random-kinematics GOMP problem.  ``feasible=True`` widens the
    workspace box and moves obstacles far away so the QP is solvable (the
    default tight variant exercises assembly including real collision rows).
    """
    balls = make_balls()
    if with_obstacles and feasible:
        obstacles = [
            HorizontalLine.create([1.0, 0.2], [100.0, 100.0, 0.3], True),
            HorizontalLine.create([0.0, 1.0], [-100.0, 100.0, 0.4], False),
        ]
    elif with_obstacles == "sphere":
        # Mixed list: the reference's line + the extension sphere, placed
        # near the fake-FK points so live keep-out rows are exercised.
        obstacles = [
            HorizontalLine.create([1.0, 0.2], [0.0, 0.1, 0.3], True),
            SphereObstacle.create(OFFS[0] + 0.05, radius=0.2, margin=0.15),
        ]
    elif with_obstacles:
        obstacles = [
            HorizontalLine.create([1.0, 0.2], [0.0, 0.1, 0.3], True),
            HorizontalLine.create([0.0, 1.0], [0.2, 0.0, 0.4], False),
        ]
    else:
        obstacles = []
    if feasible:
        con3d = (np.full(3, -50.0), np.full(3, 50.0))
    else:
        con3d = (np.array([-C.INF, -0.4, -C.INF]), np.array([2.0, C.INF, 1.5]))
    start = np.zeros(N)
    end = np.array([np.pi, 0.1, -0.2])
    pos_con = C.in_range(N, -2 * np.pi, 2 * np.pi)
    vel_con = C.in_range(N, -1.2, 1.2)
    acc_con = C.in_range(N, -0.9, 0.9)
    traj = np.concatenate(
        [np.linspace(start, end, W).reshape(-1), np.zeros(W * N)]
    )
    return balls, obstacles, con3d, start, end, pos_con, vel_con, acc_con, traj


def build_both(with_obstacles=True, feasible=False):
    balls, obstacles, con3d, start, end, pos_con, vel_con, acc_con, traj = (
        make_problem(with_obstacles, feasible)
    )
    dense = (
        ConstraintBuilder(W, N, balls=balls, obstacles=obstacles)
        .position(0, C.equal(start))
        .positions(1, W - 2, pos_con)
        .position(W - 3, C.equal(end))
        .velocities(0, W - 4, vel_con)
        .velocity(W - 3, C.eq_zero(N))
        .accelerations(0, W - 4, acc_con)
        .acceleration(W - 3, C.eq_zero(N))
        .with_obstacles(C.Constraint(*con3d), traj)
    )
    qp = empty_trajectory_qp(
        W, N, [b.is_gripper for b in balls], len(obstacles)
    )
    qp = with_gomp_boxes(qp, start, end, pos_con, vel_con, acc_con)
    qp = linearize_workspace(qp, balls, obstacles, con3d, traj)
    return dense, qp, traj


@pytest.mark.parametrize("with_obstacles", [False, True, "sphere"])
def test_bounds_and_matrix_parity(with_obstacles):
    dense, qp, _ = build_both(with_obstacles)
    l_ref, A_ref, u_ref = dense.build()
    rmap = qp.row_map()
    np.testing.assert_allclose(np.asarray(qp.l), l_ref[rmap], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(qp.u), u_ref[rmap], rtol=1e-12)
    _, _, A_struct, _, _ = qp.to_dense()
    np.testing.assert_allclose(np.asarray(A_struct), A_ref[rmap], atol=1e-12)
    # Rows not covered by the compact map are exactly the inert padding rows.
    mask = np.ones(len(l_ref), bool)
    mask[rmap] = False
    assert np.all(A_ref[mask] == 0)
    assert np.all(l_ref[mask] <= -C.INF_THRESHOLD)
    assert np.all(u_ref[mask] >= C.INF_THRESHOLD)


def test_P_matches_reference_objective():
    _, qp, _ = build_both(False)
    P_dense, _, _, _, _ = qp.to_dense()
    np.testing.assert_allclose(
        np.asarray(P_dense), smoothness_objective(W, N), atol=1e-14
    )


def test_matvecs_match_dense():
    _, qp, _ = build_both(True)
    _, _, A, _, _ = qp.to_dense()
    A = np.asarray(A)
    rng = np.random.default_rng(1)
    x = rng.normal(size=2 * W * N)
    y = rng.normal(size=qp.m)
    np.testing.assert_allclose(np.asarray(qp.A_matvec(x)), A @ x, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(qp.AT_matvec(y)), A.T @ y, rtol=1e-10)
    P = np.asarray(qp.to_dense()[0])
    np.testing.assert_allclose(np.asarray(qp.P_matvec(x)), P @ x, rtol=1e-10)


def test_ruiz_norms_match_dense():
    _, qp, _ = build_both(True)
    P, _, A, _, _ = (np.asarray(a) for a in qp.to_dense())
    np.testing.assert_allclose(
        np.asarray(qp.A_col_absmax()), np.abs(A).max(axis=0), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(qp.A_row_absmax()), np.abs(A).max(axis=1), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(qp.P_col_absmax()), np.abs(P).max(axis=0), rtol=1e-12
    )


def test_scale_data_matches_dense():
    _, qp, _ = build_both(True)
    P, q, A, l, u = (np.asarray(a) for a in qp.to_dense())
    rng = np.random.default_rng(3)
    D = np.exp(rng.normal(size=2 * W * N) * 0.3)
    E = np.exp(rng.normal(size=qp.m) * 0.3)
    c = 1.7
    sq = qp.scale_data(jnp.asarray(D), jnp.asarray(E), c)
    P_s, q_s, A_s, l_s, u_s = (np.asarray(a) for a in sq.to_dense())
    np.testing.assert_allclose(P_s, c * np.diag(D) @ P @ np.diag(D), rtol=1e-10)
    np.testing.assert_allclose(A_s, np.diag(E) @ A @ np.diag(D), rtol=1e-10)
    np.testing.assert_allclose(q_s, c * D * q, rtol=1e-12)
    np.testing.assert_allclose(l_s, E * l, rtol=1e-12)
    np.testing.assert_allclose(u_s, E * u, rtol=1e-12)


def test_kkt_blocks_match_dense():
    _, qp, _ = build_both(True)
    P, _, A, _, _ = (np.asarray(a) for a in qp.to_dense())
    rng = np.random.default_rng(4)
    rho = np.exp(rng.normal(size=qp.m))
    sigma = 1e-6
    M_ref = P + sigma * np.eye(2 * W * N) + A.T @ (rho[:, None] * A)
    diag, lower = qp.kkt_blocks(jnp.asarray(rho), sigma)
    M_int = np.asarray(block_tridiag_to_dense(diag, lower))
    perm = np.asarray(qp._perm_to_interleaved())
    M_struct = M_int[np.ix_(perm, perm)]
    np.testing.assert_allclose(M_struct, M_ref, rtol=1e-9, atol=1e-9)


def test_kkt_solve_matches_dense():
    _, qp, _ = build_both(True)
    P, _, A, _, _ = (np.asarray(a) for a in qp.to_dense())
    rng = np.random.default_rng(5)
    rho = np.exp(rng.normal(size=qp.m))
    sigma = 1e-6
    M_ref = P + sigma * np.eye(2 * W * N) + A.T @ (rho[:, None] * A)
    rhs = rng.normal(size=2 * W * N)
    factor = qp.kkt_factor(jnp.asarray(rho), sigma)
    x = np.asarray(qp.kkt_solve(factor, jnp.asarray(rhs)))
    np.testing.assert_allclose(x, np.linalg.solve(M_ref, rhs), rtol=1e-8)


def test_infeasible_problem_detected_both_paths():
    """The tight variant is genuinely primal infeasible (vel box ±1.2·0.5
    can't traverse π in W-3 steps is the feasible-variant bound; the original
    tight workspace box conflicts with the pinned start) — both
    representations must certify it identically."""
    _, qp, traj = build_both(True, feasible=False)
    P, q, A, l, u = qp.to_dense()
    res_d = admm.solve(DenseQP(P=P, q=q, A=A, l=l, u=u), admm.Settings(), warm_x=jnp.asarray(traj))
    res_s = admm.solve(qp, admm.Settings(), warm_x=jnp.asarray(traj))
    assert int(res_d.status) == ExitCode.kPrimalInfeasible
    assert int(res_s.status) == ExitCode.kPrimalInfeasible


def test_admm_solves_structured_equals_dense():
    """End-to-end: the same GOMP QP solved through the structured banded path
    and the dense path reaches the same solution (BASELINE config 3 shape)."""
    _, qp, traj = build_both(True, feasible=True)
    P, q, A, l, u = qp.to_dense()
    dense_qp_obj = DenseQP(P=P, q=q, A=A, l=l, u=u)
    settings = admm.Settings()
    res_d = admm.solve(dense_qp_obj, settings, warm_x=jnp.asarray(traj))
    res_s = admm.solve(qp, settings, warm_x=jnp.asarray(traj))
    assert int(res_d.status) == ExitCode.kOptimal
    assert int(res_s.status) == ExitCode.kOptimal
    np.testing.assert_allclose(
        np.asarray(res_s.x), np.asarray(res_d.x), atol=5e-3
    )
    # Both satisfy the dense KKT residuals at OSQP tolerance.
    x = np.asarray(res_s.x)
    Ax = np.asarray(A) @ x
    assert np.all(Ax >= np.asarray(l) - 5e-3)
    assert np.all(Ax <= np.asarray(u) + 5e-3)


def test_vmap_over_trajectory_qps():
    """Batched structured solve: vmap over a batch of boxed trajectory QPs."""
    balls, obstacles, con3d, start, end, pos_con, vel_con, acc_con, traj = (
        make_problem(True, feasible=True)
    )
    base = empty_trajectory_qp(W, N, [b.is_gripper for b in balls], len(obstacles))

    def build_one(shift):
        qp = with_gomp_boxes(base, start + shift, end + shift, pos_con, vel_con, acc_con)
        return linearize_workspace(qp, balls, obstacles, con3d, traj)

    shifts = jnp.linspace(-0.1, 0.1, 4)[:, None] * jnp.ones(N)
    qps = jax.vmap(build_one)(shifts)
    res = jax.vmap(lambda qp: admm.solve(qp, admm.Settings()))(qps)
    assert np.all(np.asarray(res.status) == ExitCode.kOptimal)
    assert res.x.shape == (4, 2 * W * N)


def test_obstacle_avoidance_identity_fk():
    """Controlled e2e: identity FK (p = q, exact linearization), a line
    obstacle across the path — the solution must clear it on the required
    side at every colliding waypoint."""
    Wi, Ni = 8, 3
    ball = RobotBall(
        fk=lambda s: s, jacobian=lambda s: jnp.eye(3, dtype=s.dtype),
        radius=0.05, is_gripper=True,
    )
    # Line along x at y=0, z=0.5; must pass above it.
    line = HorizontalLine.create([1.0, 0.0], [0.0, 0.0, 0.5], False)
    start = np.array([0.0, 1.0, 0.2])
    end = np.array([0.5, -1.0, 0.2])
    con3d = (np.full(3, -10.0), np.full(3, 10.0))
    qp = empty_trajectory_qp(Wi, Ni, [True], 1)
    qp = with_gomp_boxes(
        qp, start, end,
        C.in_range(Ni, -10, 10), C.in_range(Ni, -2, 2), C.in_range(Ni, -4, 4),
    )
    traj0 = np.concatenate(
        [np.linspace(start, end, Wi).reshape(-1), np.zeros(Wi * Ni)]
    )
    qp = linearize_workspace(qp, (ball,), [line], con3d, traj0)
    res = admm.solve(qp, admm.Settings(), warm_x=jnp.asarray(traj0))
    assert int(res.status) == ExitCode.kOptimal
    sol_q = np.asarray(res.x)[: Wi * Ni].reshape(Wi, Ni)
    # A single solve only constrains waypoints that collided at the warm
    # start (full clearance needs the planner's SCP loop, gomp-solver.h:66-88);
    # identity FK makes those rows exact, so they must be cleared.
    warm_q = traj0[: Wi * Ni].reshape(Wi, Ni)
    coll0 = np.asarray(line.has_collision(jnp.asarray(warm_q), ball.radius))
    clear = np.asarray(line.is_above(jnp.asarray(sol_q), ball.radius))
    assert coll0.any()  # the warm-start path does cross the line in XY
    assert np.all(clear[coll0])
