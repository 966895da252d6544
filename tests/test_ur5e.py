"""UR5e kinematics tests: FK sanity, Jacobian consistency, IK round-trips."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osqp_solver_tpu.models import ur5e


def test_fk_zero_pose():
    """At q = 0 the arm lies along -x (a2, a3 negative) with known offsets."""
    q = jnp.zeros(6, jnp.float64)
    p = np.asarray(ur5e.forward_kinematics(q))
    # Closed-form at zero: x = a2 + a3, y = -(d4 + d6), z = d1 - d5
    expected = np.array(
        [ur5e.A2 + ur5e.A3, -(ur5e.D4 + ur5e.D6), ur5e.D1 - ur5e.D5]
    )
    np.testing.assert_allclose(p, expected, atol=1e-12)


def test_fk_frames_chain():
    q = jnp.asarray(np.random.default_rng(0).uniform(-np.pi, np.pi, 6))
    fr = np.asarray(ur5e.frames(q))
    assert fr.shape == (7, 4, 4)
    np.testing.assert_allclose(fr[0], np.eye(4))
    np.testing.assert_allclose(fr[6][:3, 3], np.asarray(ur5e.forward_kinematics(q)))
    np.testing.assert_allclose(fr[5][:3, 3], np.asarray(ur5e.forward_kinematics_6_back(q)))
    np.testing.assert_allclose(fr[2][:3, 3], np.asarray(ur5e.forward_kinematics_elbow_joint(q)))
    # All transforms rigid.
    for T in fr:
        np.testing.assert_allclose(T[:3, :3] @ T[:3, :3].T, np.eye(3), atol=1e-12)


@pytest.mark.parametrize("fk,jac", [
    (ur5e.forward_kinematics, ur5e.joint_jacobian),
    (ur5e.forward_kinematics_6_back, ur5e.joint_jacobian_6_back),
    (ur5e.forward_kinematics_elbow_joint, ur5e.jacobian_elbow_joint),
])
def test_jacobian_finite_difference(fk, jac):
    q = jnp.asarray(np.random.default_rng(1).uniform(-np.pi, np.pi, 6))
    J = np.asarray(jac(q))
    assert J.shape == (3, 6)
    eps = 1e-6
    for j in range(6):
        dq = jnp.zeros(6, q.dtype).at[j].set(eps)
        fd = (np.asarray(fk(q + dq)) - np.asarray(fk(q - dq))) / (2 * eps)
        np.testing.assert_allclose(J[:, j], fd, atol=1e-6)


def test_fk_vmaps():
    qs = jnp.asarray(np.random.default_rng(2).uniform(-np.pi, np.pi, (32, 6)))
    ps = jax.vmap(ur5e.forward_kinematics)(qs)
    assert ps.shape == (32, 3)
    Js = jax.vmap(ur5e.joint_jacobian)(qs)
    assert Js.shape == (32, 3, 6)


@pytest.mark.parametrize("seed", range(6))
def test_ik_round_trip(seed):
    """FK(IK(FK(q))) == FK(q): every valid IK branch reproduces the pose."""
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.uniform(-np.pi + 0.2, np.pi - 0.2, 6))
    T = ur5e.tool_pose(q)
    sols, valid = ur5e.inverse_kinematics(T)
    valid = np.asarray(valid)
    assert valid.any(), "no IK branch valid for a reachable pose"
    found_self = False
    for i in range(8):
        if not valid[i]:
            continue
        Ti = np.asarray(ur5e.tool_pose(sols[i]))
        np.testing.assert_allclose(Ti, np.asarray(T), atol=1e-6)
        if np.allclose(
            np.asarray(ur5e.wrap_to_pi(sols[i] - q)), 0, atol=1e-6
        ):
            found_self = True
    assert found_self, "original configuration not among IK branches"


def test_ik_position_reaches_point():
    p = jnp.asarray([0.3, -0.3, 0.3])
    q, ok = ur5e.inverse_kinematics_position(p)
    assert bool(ok)
    np.testing.assert_allclose(
        np.asarray(ur5e.forward_kinematics(q)), np.asarray(p), atol=1e-6
    )


def test_inverse_kinematics_checked_raises_out_of_workspace():
    """The NoInverseKinematicSolution exception is LIVE (utils.h:66-70 is
    dead code in the reference; our checked IK entry actually raises it)."""
    from osqp_solver_tpu.utils.types import NoInverseKinematicSolution

    q = ur5e.inverse_kinematics_checked(jnp.array([0.3, 0.2, 0.4]))
    assert q.shape == (6,)
    with pytest.raises(NoInverseKinematicSolution):
        ur5e.inverse_kinematics_checked(jnp.array([5.0, 5.0, 5.0]))


@pytest.mark.parametrize("frame", ["tool", "back6", "elbow"])
def test_soa_matches_matrix_path(frame):
    """The structure-of-arrays batched FK + geometric Jacobian equals the
    4x4-matrix FK and its jacfwd exactly (same chain, different layout)."""
    fk = {"tool": ur5e.forward_kinematics,
          "back6": ur5e.forward_kinematics_6_back,
          "elbow": ur5e.forward_kinematics_elbow_joint}[frame]
    jac = {"tool": ur5e.joint_jacobian,
           "back6": ur5e.joint_jacobian_6_back,
           "elbow": ur5e.jacobian_elbow_joint}[frame]
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.uniform(-np.pi, np.pi, size=(7, 5, 6)))
    pts, J = ur5e.fk_jacobian_points(q, frame=frame)
    pts_ref = jax.vmap(jax.vmap(fk))(q)
    J_ref = jax.vmap(jax.vmap(jac))(q)
    np.testing.assert_allclose(np.asarray(pts), np.asarray(pts_ref),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ref),
                               rtol=0, atol=1e-12)


def test_make_ball_batched_evaluator_consistent():
    ball = ur5e.make_ball("tool", 0.05, is_gripper=True)
    q = jnp.asarray(np.random.default_rng(5).uniform(-1, 1, size=(4, 6)))
    pts, J = ball.fk_jac_batched(q)
    np.testing.assert_allclose(np.asarray(pts),
                               np.asarray(jax.vmap(ball.fk)(q)), atol=1e-12)
    np.testing.assert_allclose(np.asarray(J),
                               np.asarray(jax.vmap(ball.jacobian)(q)), atol=1e-12)

pytestmark = pytest.mark.quick  # fast tier: see CLAUDE.md
