"""Session API tests: setup/update/warm-start/factor-cache semantics
(mirroring osqp-wrapper.h) and the MPC scan (BASELINE config 4)."""
import jax
import jax.numpy as jnp
import numpy as np

from osqp_solver_tpu.ops import admm, session as S
from osqp_solver_tpu.ops.qp import dense_qp
from osqp_solver_tpu.ops.status import ExitCode

from test_admm import check_kkt, random_qp

import pytest

# Mid tier: solver+planner integration paths the quick tier skips
# (pyproject `mid` marker; see CLAUDE.md).
pytestmark = pytest.mark.mid


def test_session_solve_matches_direct():
    qp = random_qp(jax.random.PRNGKey(0), n=10, m=14)
    sess = S.setup(qp)
    sess, res = S.solve(sess)
    assert int(res.status) == ExitCode.kOptimal
    direct = admm.solve(qp)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(direct.x), atol=1e-6)


def test_session_warm_resolve_fast():
    qp = random_qp(jax.random.PRNGKey(1), n=10, m=14)
    sess = S.setup(qp)
    sess, res1 = S.solve(sess)
    sess, res2 = S.solve(sess)  # warm-started from solution
    assert int(res2.iterations) <= admm.Settings().check_termination
    np.testing.assert_allclose(np.asarray(res2.x), np.asarray(res1.x), atol=5e-3)


def test_update_values_only():
    """Coefficient update with frozen scaling reaches the new problem's
    solution (UpdateConstraintMatrix semantics)."""
    qp = random_qp(jax.random.PRNGKey(2), n=8, m=12)
    sess = S.setup(qp)
    sess, _ = S.solve(sess)
    new_qp = qp.replace(A=qp.A * 1.1)
    sess = S.update(sess, new_qp)
    sess, res = S.solve(sess)
    assert int(res.status) == ExitCode.kOptimal
    check_kkt(new_qp, res)


def test_bounds_update_keeps_factor():
    """Bounds-only updates skip refactorization and still solve correctly."""
    qp = random_qp(jax.random.PRNGKey(3), n=8, m=12)
    sess = S.setup(qp)
    sess, _ = S.solve(sess)
    factor_before = sess.factor
    new_qp = qp.replace(l=qp.l - 0.1, u=qp.u + 0.2)
    sess = S.update_bounds(sess, l=new_qp.l, u=new_qp.u)
    # same factor object tree (no recompute requested)
    assert sess.factor is factor_before
    sess, res = S.solve(sess)
    assert int(res.status) == ExitCode.kOptimal
    check_kkt(new_qp, res)


def test_mpc_scan_on_device():
    """lax.scan MPC sweep: shifting box bounds, warm starts carried — later
    steps converge in fewer iterations than the cold first step."""
    n = 8
    P = np.eye(n)
    q = np.zeros(n)
    A = np.eye(n)
    qp = dense_qp(P, q, A, -np.ones(n), np.ones(n))
    settings = admm.Settings(adaptive_rho=False)
    sess = S.setup(qp, settings)

    shifts = jnp.linspace(0.0, 0.5, 20)[:, None] * jnp.ones(n)

    def apply_update(base, shift):
        return base.replace(l=jnp.asarray(-1.0 + shift), u=jnp.asarray(1.0 + shift))

    sess, (xs, statuses, iters) = jax.jit(
        lambda s, u: S.mpc_scan(s, u, apply_update, settings)
    )(sess, shifts)
    assert xs.shape == (20, n)
    assert np.all(np.asarray(statuses) == ExitCode.kOptimal)
    # Each step's target is the projection of 0 onto the shifted box:
    # x* = clip(0, l, u) = shift - 1 where shift > 1? here l=-1+s<0<u -> x*=0
    np.testing.assert_allclose(np.asarray(xs), 0.0, atol=5e-3)
    # warm-started steps are cheap
    assert int(np.median(np.asarray(iters)[1:])) <= 25
