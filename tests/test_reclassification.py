"""Bounds-update reclassification hazard (VERDICT r2 next #8).

OSQP's cached KKT factor bakes in ρ_vec, which is derived from each row's
classification (equality rows get 1e3·ρ, loose rows ρ_min —
``admm._rho_vec``).  ``osqp_update_bounds`` therefore refactorizes when a
bounds update flips a row's type; our sessions keep the factor on the
bounds fast path (``osqp-wrapper.h:33-43`` semantics) and offer
``guard_reclassification`` instead.  These tests PIN the failure mode and
the guard:

* an unguarded equality↔box flip STALLS (multiples of the guarded iteration
  count) but never returns a wrong answer — termination always evaluates
  true residuals;
* the guard detects the flip, refactors once, and restores fast
  convergence; on classification-stable updates it refactors nothing.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osqp_solver_tpu.ops import admm, session as S
from osqp_solver_tpu.ops.qp import dense_qp
from osqp_solver_tpu.ops.session_lane import (
    setup_lane,
    solve_lane,
    update_bounds_lane,
)
from osqp_solver_tpu.ops.status import ExitCode

pytestmark = pytest.mark.quick

ST = admm.Settings(check_termination=5)


def _problem():
    rng = np.random.default_rng(0)
    n, m = 12, 16
    M = rng.normal(size=(n, n))
    P = M @ M.T / n + 0.5 * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    Ax0 = A @ rng.normal(size=n)
    l, u = Ax0 - 1.0, Ax0 + 1.0
    return P, q, A, l, u, Ax0


def test_equality_to_loose_flip_stalls_unguarded():
    P, q, A, l, u, Ax0 = _problem()
    l[0] = u[0] = Ax0[0]  # row 0: equality
    sess = S.setup(dense_qp(P, q, A, l, u), ST)
    sess, r0 = S.solve(sess, ST)
    assert int(r0.status) == ExitCode.kOptimal

    l2, u2 = l.copy(), u.copy()
    l2[0], u2[0] = Ax0[0] - 50.0, Ax0[0] + 50.0  # flip to a wide box

    s_un = S.update_bounds(
        sess, guard_reclassification=False, settings=ST,
        l=jnp.asarray(l2), u=jnp.asarray(u2),
    )
    s_un, r_un = S.solve(s_un, ST)
    s_gd = S.update_bounds(
        sess, guard_reclassification=True, settings=ST,
        l=jnp.asarray(l2), u=jnp.asarray(u2),
    )
    s_gd, r_gd = S.solve(s_gd, ST)

    # Both still reach optimality (termination checks TRUE residuals)...
    assert int(r_un.status) == ExitCode.kOptimal
    assert int(r_gd.status) == ExitCode.kOptimal
    # ...but the stale-factor path stalls hard (measured 120 vs 15 iters).
    assert int(r_un.iterations) >= 4 * int(r_gd.iterations)

    # The guarded warm re-solve matches a cold fresh setup's solution.
    fresh = S.setup(dense_qp(P, q, A, l2, u2), ST)
    _, r_f = S.solve(fresh, ST)
    assert abs(float(r_gd.obj_val) - float(r_f.obj_val)) <= 1e-2 * max(
        1.0, abs(float(r_f.obj_val))
    )


def test_loose_to_equality_flip_guard_refactors():
    P, q, A, l, u, Ax0 = _problem()
    l[0], u[0] = Ax0[0] - 50.0, Ax0[0] + 50.0  # row 0: wide box
    sess = S.setup(dense_qp(P, q, A, l, u), ST)
    sess, r0 = S.solve(sess, ST)
    assert int(r0.status) == ExitCode.kOptimal

    l2, u2 = l.copy(), u.copy()
    l2[0] = u2[0] = Ax0[0]  # flip to equality (factor now 1e3x too light)
    s_un = S.update_bounds(
        sess, guard_reclassification=False, settings=ST,
        l=jnp.asarray(l2), u=jnp.asarray(u2),
    )
    s_un, r_un = S.solve(s_un, ST)
    s_gd = S.update_bounds(
        sess, guard_reclassification=True, settings=ST,
        l=jnp.asarray(l2), u=jnp.asarray(u2),
    )
    s_gd, r_gd = S.solve(s_gd, ST)
    assert int(r_gd.status) == ExitCode.kOptimal
    assert int(r_gd.iterations) <= int(r_un.iterations)
    # the guarded path satisfies the pinned equality tightly
    x = np.asarray(r_gd.x)
    assert abs(A[0] @ x - Ax0[0]) <= 5e-3


def test_guard_noop_on_stable_update():
    """Classification-stable shift: the guard must keep the cached factor
    (pytree-identical) — zero refactor cost on the fast path."""
    P, q, A, l, u, Ax0 = _problem()
    sess = S.setup(dense_qp(P, q, A, l, u), ST)
    d = 1e-3
    s2 = S.update_bounds(
        sess, guard_reclassification=True, settings=ST,
        l=jnp.asarray(l + d), u=jnp.asarray(u + d),
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(sess.factor),
        jax.tree_util.tree_leaves(s2.factor),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _lane_batch(B=4, W=12, N=3, dtype=jnp.float64):
    from osqp_solver_tpu.gomp.trajectory_qp import (
        empty_trajectory_qp,
        with_gomp_boxes,
    )
    from osqp_solver_tpu.gomp.trajectory_qp_lane import to_lane

    base = empty_trajectory_qp(W, N, gripper_flags=(), n_obstacles=0, dtype=dtype)
    pos = (jnp.full(N, -10.0, dtype), jnp.full(N, 10.0, dtype))
    vel = (jnp.full(N, -1.0, dtype), jnp.full(N, 1.0, dtype))
    acc = (jnp.full(N, -2.0, dtype), jnp.full(N, 2.0, dtype))

    def one(i):
        start = 0.02 * jnp.sin(jnp.arange(N, dtype=dtype) + i)
        end = 1.0 + 0.02 * jnp.cos(jnp.arange(N, dtype=dtype) * 1.3 + i)
        return with_gomp_boxes(base, start, end, pos, vel, acc)

    return to_lane(jax.vmap(one)(jnp.arange(B, dtype=dtype)))


def test_lane_guard_detects_flip_across_batch():
    """One problem's goal equality flips to a box mid-sweep: the lane guard
    refactors the batch once and convergence stays fast; unguarded stalls."""
    st = dataclasses.replace(ST, fused_chunk="off")
    lane = _lane_batch()
    sess = setup_lane(lane, st)
    sess, r0 = solve_lane(sess, st)
    assert np.all(np.asarray(r0.status) == ExitCode.kOptimal)

    # Flip the final-waypoint position equality of problem 0 only.
    pos_u = sess.base.pos_u.at[-1, :, 0].add(50.0)
    s_un = update_bounds_lane(sess, pos_u=pos_u)
    s_un, r_un = solve_lane(s_un, st)
    s_gd = update_bounds_lane(
        sess, guard_reclassification=True, settings=st, pos_u=pos_u
    )
    s_gd, r_gd = solve_lane(s_gd, st)

    assert np.all(np.asarray(r_gd.status) == ExitCode.kOptimal)
    assert int(np.asarray(r_gd.iterations)[0]) <= int(
        np.asarray(r_un.iterations)[0]
    )
    # untouched problems keep converging quickly under both paths
    assert np.all(np.asarray(r_un.iterations)[1:] <= 2 * ST.check_termination)

    # Stable shift → factor kept bit-for-bit.
    s_st = update_bounds_lane(
        sess, guard_reclassification=True, settings=st,
        pos_u=sess.base.pos_u + 1e-4, pos_l=sess.base.pos_l + 1e-4,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(sess.factor),
        jax.tree_util.tree_leaves(s_st.factor),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
