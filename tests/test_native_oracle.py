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


def _small_trajectory_qp():
    import jax.numpy as jnp

    from osqp_solver_tpu.gomp.trajectory_qp import (
        empty_trajectory_qp,
        linearize_workspace,
        with_gomp_boxes,
    )
    from osqp_solver_tpu.models.robot import RobotBall

    W, N = 8, 2
    qp = empty_trajectory_qp(W, N, gripper_flags=(True,), n_obstacles=0)
    qp = with_gomp_boxes(
        qp,
        jnp.zeros(N),
        jnp.ones(N),
        (jnp.full(N, -5.0), jnp.full(N, 5.0)),
        (jnp.full(N, -1.0), jnp.full(N, 1.0)),
        (jnp.full(N, -2.0), jnp.full(N, 2.0)),
    )
    ball = RobotBall(
        fk=lambda s: jnp.array([s[0], s[1], s[0] + s[1]]),
        jacobian=lambda s: jnp.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]),
        radius=0.05,
        is_gripper=True,
    )
    warm = jnp.concatenate([jnp.linspace(0, 1, W * N), jnp.zeros(W * N)])
    con3d = (jnp.full(3, -4.0), jnp.full(3, 4.0))
    return linearize_workspace(qp, [ball], [], con3d, warm)


def test_sparse_csr_matches_dense():
    """to_csr() reproduces to_dense() exactly (modulo the interleaving
    permutation)."""
    qp = _small_trajectory_qp()
    P, q, A, l, u = (np.asarray(a) for a in qp.to_dense())
    (Pi, Pj, Pd), q_int, (Ai, Aj, Ad), l_s, u_s, kb, perm = qp.to_csr()

    def densify(indptr, indices, data, cols):
        M = np.zeros((len(indptr) - 1, cols))
        for r in range(len(indptr) - 1):
            for p in range(indptr[r], indptr[r + 1]):
                M[r, indices[p]] += data[p]
        return M

    n = q.size
    A_int = densify(Ai, Aj, Ad, n)
    P_int = densify(Pi, Pj, Pd, n)
    np.testing.assert_allclose(A_int[:, perm], A, atol=1e-12)
    np.testing.assert_allclose(P_int[np.ix_(perm, perm)], P, atol=1e-12)
    np.testing.assert_allclose(q_int[perm], q, atol=1e-12)
    np.testing.assert_allclose(l_s, l, atol=1e-12)
    np.testing.assert_allclose(u_s, u, atol=1e-12)


def test_sparse_oracle_matches_jax_on_trajectory():
    """Banded-KKT sparse oracle agrees with the JAX core on a structured
    trajectory QP (the W=802 CPU-anchor path, benchmarks/cpu_anchor.py)."""
    qp = _small_trajectory_qp()
    P_csr, q_int, A_csr, l, u, kb, perm = qp.to_csr()
    res_c = oracle.solve_sparse(P_csr, q_int, A_csr, l, u, kb)
    assert res_c.status == ExitCode.kOptimal
    res_jax = admm.solve(qp)
    assert int(res_jax.status) == ExitCode.kOptimal
    np.testing.assert_allclose(
        res_c.x[perm], np.asarray(res_jax.x), atol=5e-2
    )


def test_oracle_residuals_meet_tolerance():
    qp = random_qp(jax.random.PRNGKey(5), n=12, m=20)
    res = oracle.solve(
        np.asarray(qp.P), np.asarray(qp.q), np.asarray(qp.A),
        np.asarray(qp.l), np.asarray(qp.u),
    )
    assert res.status == ExitCode.kOptimal
    assert res.prim_res < 1e-2 and res.dual_res < 1e-2


def test_sparse_oracle_infeasibility_certificates():
    """The banded-KKT sparse oracle emits the primal-infeasibility
    certificate (round 3 — previously only the dense path had certificates)
    and agrees with the JAX core on a contradictory trajectory QP."""
    import jax.numpy as jnp

    from osqp_solver_tpu.gomp.trajectory_qp import (
        empty_trajectory_qp,
        with_gomp_boxes,
    )

    W, N = 8, 2
    qp = empty_trajectory_qp(W, N)
    qp = with_gomp_boxes(
        qp,
        jnp.zeros(N),
        jnp.ones(N),  # goal pinned at 1 ...
        (jnp.full(N, -0.01), jnp.full(N, 0.01)),  # ... but pos box is ±0.01
        (jnp.full(N, -5.0), jnp.full(N, 5.0)),
        (jnp.full(N, -5.0), jnp.full(N, 5.0)),
    )
    P_csr, q_int, A_csr, l, u, kb, perm = qp.to_csr()
    res_c = oracle.solve_sparse(P_csr, q_int, A_csr, l, u, kb)
    assert res_c.status == ExitCode.kPrimalInfeasible
    res_jax = admm.solve(qp)
    assert int(res_jax.status) == ExitCode.kPrimalInfeasible
