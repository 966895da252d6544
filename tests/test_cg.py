"""Indirect (CG) KKT backend tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osqp_solver_tpu.ops import admm
from osqp_solver_tpu.ops.cg import cg_solve
from osqp_solver_tpu.ops.status import ExitCode

from test_admm import check_kkt, random_qp


def test_cg_solves_reduced_system():
    qp = random_qp(jax.random.PRNGKey(0), n=20, m=30)
    rho = jnp.full(30, 0.5, jnp.float64)
    sigma = 1e-6
    b = jax.random.normal(jax.random.PRNGKey(1), (20,), jnp.float64)
    res = cg_solve(qp, rho, sigma, b, tol=1e-10, max_iter=500)
    K = np.asarray(qp.P) + sigma * np.eye(20) + np.asarray(qp.A).T @ (
        np.asarray(rho)[:, None] * np.asarray(qp.A)
    )
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(K, b), rtol=1e-6)


@pytest.mark.parametrize("seed", [0, 4])
def test_admm_with_cg_backend(seed):
    qp = random_qp(jax.random.PRNGKey(seed), n=16, m=24)
    res = admm.solve(qp, admm.Settings(kkt_method="cg"))
    assert int(res.status) == ExitCode.kOptimal
    check_kkt(qp, res)


def test_cg_matches_direct_on_trajectory_qp():
    import sys
    sys.path.insert(0, "tests")
    from test_trajectory_qp import build_both

    _, qp, traj = build_both(True, feasible=True)
    rd = admm.solve(qp, admm.Settings(), warm_x=jnp.asarray(traj))
    rc = admm.solve(
        qp, admm.Settings(kkt_method="cg", cg_max_iter=400), warm_x=jnp.asarray(traj)
    )
    assert int(rd.status) == ExitCode.kOptimal
    assert int(rc.status) == ExitCode.kOptimal
    np.testing.assert_allclose(np.asarray(rc.x), np.asarray(rd.x), atol=1e-2)

pytestmark = pytest.mark.quick  # fast tier: see CLAUDE.md
