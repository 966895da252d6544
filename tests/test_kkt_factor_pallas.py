"""Parity: fused assemble+factor+pack kernel vs kkt_factor + pack_factor.

The kernel re-derives ``P + σI + Aᵀdiag(ρ)A`` from the stencil coefficient
pack in VMEM (reference: OSQP setup/qdldl factorization, SURVEY §3.4), so
this pins it against the generic path (XLA assembly + scan factorization +
pack) on the honest GOMP class with workspace + obstacle rows.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osqp_solver_tpu.ops import admm
from osqp_solver_tpu.ops.admm_fused import pack_factor
from osqp_solver_tpu.ops.admm_lane import _rho_vec, ruiz_equilibrate_lane
from osqp_solver_tpu.ops.kkt_factor_pallas import (
    build_p_vel_packs,
    factor_packed_lane,
    factor_packed_supported,
)


def _honest_lane_batch(B=128, W=7, N=6, dtype=jnp.float32, seed=0):
    from osqp_solver_tpu import RobotBall
    from osqp_solver_tpu.gomp.geometry import HorizontalLine
    from osqp_solver_tpu.gomp.trajectory import calc_warm_start_jnp
    from osqp_solver_tpu.gomp.trajectory_qp import (
        empty_trajectory_qp,
        linearize_workspace,
        with_gomp_boxes,
    )
    from osqp_solver_tpu.gomp.trajectory_qp_lane import from_trailing
    from osqp_solver_tpu.models import ur5e

    INF = 1e30
    balls = (
        RobotBall(fk=ur5e.forward_kinematics_6_back,
                  jacobian=ur5e.joint_jacobian_6_back, radius=0.15,
                  is_gripper=False),
        RobotBall(fk=ur5e.forward_kinematics,
                  jacobian=ur5e.joint_jacobian, radius=0.05, is_gripper=True),
    )
    obstacles = [HorizontalLine.create((0.0, 1.0), (0.35, 0.0, 0.15))]
    con3d = (jnp.asarray([-INF, -0.4, -INF], dtype),
             jnp.asarray([INF, INF, INF], dtype))
    pos = (jnp.full(N, -2 * np.pi, dtype), jnp.full(N, 2 * np.pi, dtype))
    vel = (jnp.full(N, -0.3, dtype), jnp.full(N, 0.3, dtype))
    acc = (jnp.full(N, -1.4, dtype), jnp.full(N, 1.4, dtype))
    base = empty_trajectory_qp(
        W, N, gripper_flags=(False, True), n_obstacles=1, dtype=dtype
    )

    def one(i):
        start = 0.02 * jnp.sin(jnp.arange(N, dtype=dtype) + i + seed)
        end = jnp.asarray([np.pi, 0, 0, 0, 0, 0], dtype) + 0.02 * jnp.cos(
            jnp.arange(N, dtype=dtype) * 1.3 + i
        )
        qp = with_gomp_boxes(base, start, end, pos, vel, acc)
        warm = calc_warm_start_jnp(start, end, W)
        return linearize_workspace(qp, balls, obstacles, con3d, warm)

    return from_trailing(
        jax.vmap(one, out_axes=-1)(jnp.arange(B, dtype=dtype)),
        row_layout="waypoint",
    )


def test_factor_packed_parity():
    settings = admm.Settings()
    lane = _honest_lane_batch()
    assert factor_packed_supported(lane)
    scaled, scaling = ruiz_equilibrate_lane(lane, settings.scaling)
    rho_bar = jnp.full((lane.batch,), settings.rho, scaled.q.dtype)
    rho_vec = _rho_vec(rho_bar, scaled.l, scaled.u)

    ref_c, ref_g = pack_factor(
        scaled, scaled.kkt_factor(rho_vec, settings.sigma)
    )
    got_c, got_g = factor_packed_lane(
        scaled, rho_vec, settings.sigma, interpret=True
    )
    assert got_c.shape == ref_c.shape and got_g.shape == ref_g.shape
    np.testing.assert_allclose(
        np.asarray(got_c), np.asarray(ref_c), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_g), np.asarray(ref_g), rtol=2e-4, atol=2e-5
    )


def test_p_vel_packs():
    lane = _honest_lane_batch(B=128, W=5)
    Pd, Pl = build_p_vel_packs(lane)
    N = lane.n_dim
    np.testing.assert_array_equal(
        np.asarray(Pd[:, :N]),
        np.asarray(
            jnp.stack(
                [lane.P_diag[:, N + j, N + j] for j in range(N)], axis=1
            )
        ),
    )
    assert Pl.shape[0] == lane.waypoints
    np.testing.assert_array_equal(np.asarray(Pl[-1]), 0.0)


def test_factor_packed_gain_free():
    """emit_gain=False (the hrec chunk path) must produce the identical
    cholp and return None for the gain pack."""
    settings = admm.Settings()
    lane = _honest_lane_batch()
    scaled, _ = ruiz_equilibrate_lane(lane, settings.scaling)
    rho_bar = jnp.full((lane.batch,), settings.rho, scaled.q.dtype)
    rho_vec = _rho_vec(rho_bar, scaled.l, scaled.u)

    ref_c, ref_g = factor_packed_lane(
        scaled, rho_vec, settings.sigma, interpret=True
    )
    got_c, got_g = factor_packed_lane(
        scaled, rho_vec, settings.sigma, interpret=True, emit_gain=False
    )
    assert got_g is None and ref_g is not None
    np.testing.assert_array_equal(np.asarray(got_c), np.asarray(ref_c))
