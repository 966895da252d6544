"""Generic DH robot model: FK/Jacobian parity, numeric IK, and the
end-to-end proof that the GOMP/ADMM stack is generic in the joint count N
(the reference is hard-wired to the 6-DOF UR5e via the external
``Kinematics-UR5e-arm`` library — SURVEY.md §2.2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osqp_solver_tpu import constraints as C
from osqp_solver_tpu.gomp.planner import GOMPSolver
from osqp_solver_tpu.models import ur5e
from osqp_solver_tpu.models.dh_robot import IIWA14, SCARA, UR5E, UR10E, ik_checked

# All tests are quick-tier except the 7-DOF planner end-to-end (compiles
# ~10 horizon programs, ~45 s) — marked individually below.
quick = pytest.mark.quick  # fast tier: see CLAUDE.md


def _rand_q(key, n, batch=()):
    return jax.random.uniform(key, batch + (n,), minval=-2.5, maxval=2.5)


@quick
def test_ur5e_preset_matches_analytic_module():
    """The DH-table path reproduces models/ur5e.py exactly (same table,
    same convention) for all three frames the example app uses."""
    q = _rand_q(jax.random.PRNGKey(0), 6)
    np.testing.assert_allclose(
        UR5E.point_fk(q), ur5e.forward_kinematics(q), atol=1e-12)
    np.testing.assert_allclose(
        UR5E.point_fk(q, link=5), ur5e.forward_kinematics_6_back(q), atol=1e-12)
    np.testing.assert_allclose(
        UR5E.point_fk(q, link=2), ur5e.forward_kinematics_elbow_joint(q),
        atol=1e-12)
    np.testing.assert_allclose(
        UR5E.jacobian()(q), ur5e.joint_jacobian(q), atol=1e-12)


@quick
@pytest.mark.parametrize(
    "robot", [UR5E, UR10E, IIWA14, SCARA], ids=lambda r: r.name
)
def test_soa_matches_matrix_path(robot):
    """SoA batched FK + geometric Jacobian == jacfwd of the matrix FK, for
    every frame, including 7-DOF and batched inputs."""
    n = robot.n_joints
    q = _rand_q(jax.random.PRNGKey(1), n, batch=(4, 3))
    for link in (n, n - 1, 2):
        pts, jac = robot.fk_jacobian_points(q, link=link)
        assert pts.shape == (4, 3, 3) and jac.shape == (4, 3, 3, n)
        ref_fk = jax.vmap(jax.vmap(robot.fk(link)))(q)
        ref_jac = jax.vmap(jax.vmap(robot.jacobian(link)))(q)
        np.testing.assert_allclose(pts, ref_fk, atol=1e-10)
        np.testing.assert_allclose(jac, ref_jac, atol=1e-10)


@quick
@pytest.mark.parametrize(
    "robot", [UR5E, IIWA14, SCARA], ids=lambda r: r.name
)
def test_position_ik_round_trip(robot):
    """DLS IK reaches an FK-generated (guaranteed-reachable) target; works
    jitted; the redundant 7-DOF arm converges too."""
    q_true = _rand_q(jax.random.PRNGKey(2), robot.n_joints) * 0.5
    target = robot.point_fk(q_true)
    q0 = q_true + 0.3
    q, ok = jax.jit(lambda p, q0: robot.position_ik(p, q0))(target, q0)
    assert bool(ok)
    np.testing.assert_allclose(robot.point_fk(q), target, atol=1e-6)


@quick
def test_position_ik_vmap_batch():
    """DLS IK is vmappable — a fleet of targets solved in one program."""
    robot = IIWA14
    q_true = _rand_q(jax.random.PRNGKey(5), robot.n_joints, batch=(16,)) * 0.4
    targets = robot.fk_jacobian_points(q_true)[0]
    qs, oks = jax.vmap(lambda p, q0: robot.position_ik(p, q0))(
        targets, q_true + 0.2)
    assert bool(jnp.all(oks))
    pts = robot.fk_jacobian_points(qs)[0]
    np.testing.assert_allclose(pts, targets, atol=1e-6)


@quick
def test_ik_checked_raises_out_of_reach():
    from osqp_solver_tpu.utils.types import NoInverseKinematicSolution

    with pytest.raises(NoInverseKinematicSolution):
        ik_checked(UR5E, jnp.array([5.0, 0.0, 0.0]))  # ~0.9 m reach


@quick
def test_position_ik_integer_target_coerced():
    """An integer target array must not poison the loop carry dtype
    (ADVICE r3): IK on an int target just works."""
    robot = IIWA14
    q, ok = robot.position_ik(jnp.array([0, 0, 1]), q0=jnp.full(7, 0.3))
    assert jnp.issubdtype(q.dtype, jnp.floating)
    assert bool(ok)
    pt = robot.point_fk(q.astype(jnp.float64))
    np.testing.assert_allclose(pt, [0.0, 0.0, 1.0], atol=1e-5)


@quick
def test_position_ik_f32_default_tol():
    """The default tolerance is dtype-aware (ADVICE r3): a converged f32
    solve reports converged=True instead of tripping on f32 FK noise."""
    robot = UR10E
    q_true = (_rand_q(jax.random.PRNGKey(7), 6) * 0.5).astype(jnp.float32)
    target = robot.fk_jacobian_points(q_true)[0]
    assert target.dtype == jnp.float32
    q, ok = robot.position_ik(target, q0=q_true + 0.2)
    assert bool(ok)


@quick
@pytest.mark.parametrize("robot", [UR10E, IIWA14], ids=lambda r: r.name)
def test_pose_ik_round_trip(robot):
    """Full-pose DLS IK reaches an FK-generated (position, orientation)
    target — the orientation-constrained-grasp capability the reference
    imports from the UR5e library (solver-example.cpp:53), for ANY arm."""
    n = robot.n_joints
    q_true = _rand_q(jax.random.PRNGKey(3), n) * 0.5
    p_t, R_t = robot.pose_fk(q_true)
    q, ok = jax.jit(lambda p, R, q0: robot.pose_ik(p, R, q0=q0))(
        p_t, R_t, q_true + 0.2)
    assert bool(ok)
    p, R = robot.pose_fk(q)
    np.testing.assert_allclose(p, p_t, atol=1e-6)
    np.testing.assert_allclose(R, R_t, atol=1e-6)
    # For the redundant arm the solution may differ from q_true — only the
    # pose is pinned; for 6-DOF it should be the same branch (local IK).
    if n == 6:
        np.testing.assert_allclose(q, q_true, atol=1e-4)


@quick
def test_pose_jacobian_matches_frames():
    """fk_pose_jacobian's R equals the matrix path's rotation and Jw's
    column i is the joint axis z_i in the base frame."""
    robot = IIWA14
    n = robot.n_joints
    q = _rand_q(jax.random.PRNGKey(4), n)
    pt, R, Jp, Jw = robot.fk_pose_jacobian(q)
    frames = robot.frames(q)
    np.testing.assert_allclose(R, frames[n][:3, :3], atol=1e-12)
    np.testing.assert_allclose(pt, frames[n][:3, 3], atol=1e-12)
    for i in range(n):
        np.testing.assert_allclose(Jw[:, i], frames[i][:3, 2], atol=1e-12)
    # Jp agrees with the position-only surface.
    np.testing.assert_allclose(
        Jp, robot.fk_jacobian_points(q)[1], atol=1e-12)


@quick
def test_pose_ik_checked_dispatch():
    """ik_checked(rot=...) routes to pose IK and raises on an unreachable
    orientation at a reachable point."""
    from osqp_solver_tpu.utils.types import NoInverseKinematicSolution

    robot = UR10E
    q_true = _rand_q(jax.random.PRNGKey(6), 6) * 0.4
    p_t, R_t = robot.pose_fk(q_true)
    q = ik_checked(robot, p_t, rot=R_t, q0=q_true + 0.1)
    p, R = robot.pose_fk(q)
    np.testing.assert_allclose(p, p_t, atol=1e-6)
    np.testing.assert_allclose(R, R_t, atol=1e-6)
    with pytest.raises(NoInverseKinematicSolution):
        # target far outside the workspace cannot satisfy the pose
        ik_checked(robot, jnp.array([9.0, 0.0, 0.0]), rot=R_t, q0=q_true)


def test_lane_planner_batched_7dof():
    """The batched lane-major HOT path (fused-driver `run_batch_lane`, block
    size 2N=14) is generic in N as well — not just the session path."""
    robot = IIWA14
    n = robot.n_joints
    solver = GOMPSolver(
        max_waypoints=12,
        time_step=0.1,
        pos_con=C.in_range(n, -3.2, 3.2),
        vel_con=C.in_range(n, -8.0, 8.0),
        acc_con=C.in_range(n, -20.0, 20.0),
        con_3d=C.in_range(3, -2.0, 2.0),
        obstacles=[],
        balls=[robot.make_ball(radius=0.05, is_gripper=True)],
    )
    starts = np.zeros((4, n))
    ends = np.tile(np.linspace(0.2, 0.5, 4)[:, None], (1, n))
    statuses, trajs, _ = solver.run_batch_lane(starts, ends, waypoints=10)
    assert all(int(s) == 0 for s in statuses)  # kOptimal
    q_end = np.asarray(trajs)[:, : 10 * n].reshape(4, 10, n)[:, 10 - 3]
    np.testing.assert_allclose(q_end, ends, atol=1e-2)  # W-3 quirk


def test_planner_end_to_end_7dof():
    """Full GOMP planning (SCP + workspace ball + horizon shrinking) with a
    7-DOF arm: the constraint builder, layout, session, and ADMM core are
    generic in N (block size 2N=14), not UR5e/6-DOF-specific."""
    robot = IIWA14
    n = robot.n_joints
    ball = robot.make_ball(radius=0.05, is_gripper=True)
    solver = GOMPSolver(
        max_waypoints=12,
        time_step=0.1,
        pos_con=C.in_range(n, -3.2, 3.2),
        vel_con=C.in_range(n, -8.0, 8.0),
        acc_con=C.in_range(n, -20.0, 20.0),
        con_3d=C.in_range(3, -2.0, 2.0),
        obstacles=[],
        balls=[ball],
    )
    start = np.zeros(n)
    end = np.full(n, 0.4)
    res = solver.run(start, end)
    assert res.status.name == "kOptimal"
    W = res.trajectory.size // (2 * n)
    q = res.trajectory[: W * n].reshape(W, n)
    np.testing.assert_allclose(q[0], start, atol=1e-2)
    np.testing.assert_allclose(q[W - 3], end, atol=1e-2)  # W-3 quirk
    # The workspace constraint was really enforced on the real kinematics.
    pts, _ = robot.fk_jacobian_points(jnp.asarray(q))
    assert float(jnp.max(jnp.abs(pts))) <= 2.0 + 1e-2


@quick
def test_scara_prismatic_geometry():
    """Prismatic-joint support (round 5): the SCARA preset's Z stroke.

    Classic-DH with ``joint_types=('r','r','p','r')``: the α₂ = π flip
    points z₃ down, so +q₃ plunges the tool; the prismatic Jacobian column
    is the joint axis itself (no lever arm) and contributes no angular
    velocity."""
    # tool at full arm extension, stroke retracted
    np.testing.assert_allclose(
        SCARA.point_fk(jnp.zeros(4, jnp.float64)), [0.6, 0.0, 0.2],
        atol=1e-12,
    )
    # +q3 plunges straight down, independent of the wrist angle
    np.testing.assert_allclose(
        SCARA.point_fk(jnp.array([0.0, 0.0, 0.15, 0.7])),
        [0.6, 0.0, 0.05], atol=1e-12,
    )
    q = jnp.array([0.4, -0.7, 0.1, 0.3], jnp.float64)
    _, jac, _, jac_w = SCARA._fk_soa(q[None])
    # prismatic column: the (downward) joint axis, unit length
    np.testing.assert_allclose(
        np.asarray(jac[0, :, 2]), [0.0, 0.0, -1.0], atol=1e-12
    )
    # ...and no angular-velocity contribution
    assert float(jnp.max(jnp.abs(jac_w[0, :, 2]))) == 0.0
    # wrist rotation moves nothing positionally (a=0, d=0 tail)
    np.testing.assert_allclose(np.asarray(jac[0, :, 3]), 0.0, atol=1e-12)


def test_planner_end_to_end_scara():
    """Full GOMP planning with the 4-DOF SCARA (block size 2N=8): the
    stack is generic BELOW 6 DOF too, and the prismatic stroke is planned
    like any joint (box limits in meters)."""
    n = SCARA.n_joints
    ball = SCARA.make_ball(radius=0.05, is_gripper=True)
    solver = GOMPSolver(
        max_waypoints=12,
        time_step=0.1,
        pos_con=C.Constraint(
            lower=np.array([-3.2, -3.2, 0.0, -3.2]),
            upper=np.array([3.2, 3.2, 0.2, 3.2]),  # 0.2 m Z stroke
        ),
        vel_con=C.in_range(n, -8.0, 8.0),
        acc_con=C.in_range(n, -20.0, 20.0),
        con_3d=C.in_range(3, -2.0, 2.0),
        obstacles=[],
        balls=[ball],
    )
    start = np.zeros(n)
    end = np.array([0.8, -0.5, 0.15, 0.4])  # swing + plunge + wrist
    res = solver.run(start, end)
    assert res.status.name == "kOptimal"
    W = res.trajectory.size // (2 * n)
    q = res.trajectory[: W * n].reshape(W, n)
    np.testing.assert_allclose(q[W - 3], end, atol=1e-2)  # W-3 quirk
    # the prismatic coordinate respected its stroke box
    assert np.all(q[:, 2] >= -1e-3) and np.all(q[:, 2] <= 0.2 + 1e-3)
