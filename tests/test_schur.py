"""Schur-complement horizon-partitioned solve tests.

Validates the distributed block-tridiagonal solve (SURVEY.md §5
"long-context / sequence parallelism") against the sequential scan solver,
both the single-device reference math and the real shard_map version on the
8-device CPU mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osqp_solver_tpu.ops.tridiag import (
    block_tridiag_factor,
    block_tridiag_solve,
)
from osqp_solver_tpu.parallel.mesh import HORIZON_AXIS, make_mesh
from osqp_solver_tpu.parallel.schur import (
    merge_solution,
    partition_blocks,
    partition_rhs,
    schur_solve_reference,
    schur_solve_sharded,
)

from test_tridiag import random_spd_tridiag


def _sequential(diag, lower, b):
    return block_tridiag_solve(block_tridiag_factor(diag, lower), b)


def test_partition_round_trip():
    W, B, K = 23, 4, 4
    diag, lower = random_spd_tridiag(jax.random.PRNGKey(0), W, B)
    b = jax.random.normal(jax.random.PRNGKey(1), (W, B), jnp.float64)
    ch = partition_blocks(diag, lower, K)
    bi, bs = partition_rhs(b, K)
    merged = merge_solution(bi, bs[: K - 1], W)
    np.testing.assert_allclose(np.asarray(merged), np.asarray(b))


@pytest.mark.parametrize("W,K", [(11, 2), (23, 4), (40, 8), (31, 3)])
def test_reference_matches_sequential(W, K):
    B = 4
    diag, lower = random_spd_tridiag(jax.random.PRNGKey(W), W, B)
    b = jax.random.normal(jax.random.PRNGKey(W + 1), (W, B), jnp.float64)
    x_seq = np.asarray(_sequential(diag, lower, b))
    x_schur = np.asarray(schur_solve_reference(diag, lower, b, K))
    np.testing.assert_allclose(x_schur, x_seq, rtol=1e-8, atol=1e-10)


def test_sharded_matches_sequential():
    """Real shard_map over the horizon axis of an 8-device CPU mesh."""
    W, B = 63, 4
    mesh = make_mesh(batch=1, horizon=8)
    diag, lower = random_spd_tridiag(jax.random.PRNGKey(3), W, B)
    b = jax.random.normal(jax.random.PRNGKey(4), (W, B), jnp.float64)
    x_seq = np.asarray(_sequential(diag, lower, b))
    x_shard = np.asarray(schur_solve_sharded(diag, lower, b, mesh))
    np.testing.assert_allclose(x_shard, x_seq, rtol=1e-8, atol=1e-10)


def test_sharded_long_horizon_kkt_like():
    """A GOMP-like KKT (12×12 blocks, 200 waypoints) split over 8 devices."""
    W, B = 200, 12
    mesh = make_mesh(batch=1, horizon=8)
    diag, lower = random_spd_tridiag(jax.random.PRNGKey(9), W, B)
    b = jax.random.normal(jax.random.PRNGKey(10), (W, B), jnp.float64)
    x_seq = np.asarray(_sequential(diag, lower, b))
    x_shard = np.asarray(schur_solve_sharded(diag, lower, b, mesh))
    np.testing.assert_allclose(x_shard, x_seq, rtol=1e-7, atol=1e-9)


def test_cached_factor_matches_sequential():
    from osqp_solver_tpu.parallel.schur import schur_factor, schur_solve_cached

    W, B, K = 37, 6, 4
    diag, lower = random_spd_tridiag(jax.random.PRNGKey(11), W, B)
    sf = schur_factor(diag, lower, K)
    for seed in (1, 2):
        b = jax.random.normal(jax.random.PRNGKey(seed), (W, B), jnp.float64)
        x = np.asarray(schur_solve_cached(sf, b))
        np.testing.assert_allclose(
            x, np.asarray(_sequential(diag, lower, b)), rtol=1e-8, atol=1e-10
        )


def test_chunked_trajectory_qp_admm():
    """Full ADMM on a long-horizon trajectory QP with the chunk-partitioned
    KKT backend matches the sequential backend (BASELINE config 5 math)."""
    import sys

    sys.path.insert(0, "tests")
    from test_trajectory_qp import build_both

    from osqp_solver_tpu.ops import admm
    from osqp_solver_tpu.ops.status import ExitCode
    from osqp_solver_tpu.parallel.horizon import as_chunked

    _, qp, traj = build_both(True, feasible=True)
    res_seq = admm.solve(qp, admm.Settings(), warm_x=jnp.asarray(traj))
    res_chunk = admm.solve(
        as_chunked(qp, 2), admm.Settings(), warm_x=jnp.asarray(traj)
    )
    assert int(res_seq.status) == ExitCode.kOptimal
    assert int(res_chunk.status) == ExitCode.kOptimal
    np.testing.assert_allclose(
        np.asarray(res_chunk.x), np.asarray(res_seq.x), atol=1e-6
    )


def test_full_admm_horizon_sharded():
    """END-TO-END distributed ADMM: the whole solver runs inside shard_map
    with the KKT factor/solve split over the 8-device horizon axis; result
    matches the single-device solver (BASELINE config 5 mechanics)."""
    import sys

    sys.path.insert(0, "tests")
    from test_trajectory_qp import build_both

    from osqp_solver_tpu.ops import admm
    from osqp_solver_tpu.ops.status import ExitCode
    from osqp_solver_tpu.parallel.horizon import solve_horizon_sharded

    _, qp, traj = build_both(True, feasible=True)
    mesh = make_mesh(batch=1, horizon=2)  # W=6 → 2 chunks of 2 + separator
    res_ref = admm.solve(qp, admm.Settings(), warm_x=jnp.asarray(traj))
    res_sh = solve_horizon_sharded(
        qp, mesh, admm.Settings(), warm_x=jnp.asarray(traj)
    )
    assert int(res_ref.status) == ExitCode.kOptimal
    assert int(res_sh.status) == ExitCode.kOptimal
    np.testing.assert_allclose(
        np.asarray(res_sh.x), np.asarray(res_ref.x), atol=1e-6
    )


def test_full_admm_horizon_sharded_8dev():
    """Longer horizon over all 8 devices."""
    import jax.numpy as jnp_

    from osqp_solver_tpu.gomp.trajectory_qp import (
        empty_trajectory_qp,
        with_gomp_boxes,
    )
    from osqp_solver_tpu.ops import admm
    from osqp_solver_tpu.ops.status import ExitCode
    from osqp_solver_tpu.parallel.horizon import solve_horizon_sharded

    W, N = 40, 3
    qp = empty_trajectory_qp(W, N)
    qp = with_gomp_boxes(
        qp,
        jnp_.zeros(N),
        jnp_.ones(N),
        (jnp_.full(N, -10.0), jnp_.full(N, 10.0)),
        (jnp_.full(N, -1.0), jnp_.full(N, 1.0)),
        (jnp_.full(N, -2.0), jnp_.full(N, 2.0)),
    )
    mesh = make_mesh(batch=1, horizon=8)
    res_ref = admm.solve(qp, admm.Settings())
    res_sh = solve_horizon_sharded(qp, mesh, admm.Settings())
    assert int(res_sh.status) == ExitCode.kOptimal
    np.testing.assert_allclose(
        np.asarray(res_sh.x), np.asarray(res_ref.x), atol=1e-6
    )


def test_auto_chunks_policy():
    """as_chunked(None) applies the measured single-device policy: scan for
    short horizons, ~W/160 chunks (clamped) for long ones; an auto-chunked
    solve stays correct (short horizon -> n_chunks=1 degenerates to the
    scan path exactly)."""
    import sys

    sys.path.insert(0, "tests")
    from test_trajectory_qp import build_both

    from osqp_solver_tpu.ops import admm
    from osqp_solver_tpu.ops.status import ExitCode
    from osqp_solver_tpu.parallel.horizon import as_chunked, auto_chunks

    assert auto_chunks(100) == 1
    assert auto_chunks(802) == 5
    assert auto_chunks(10000) == 62
    assert auto_chunks(10**6) == 128

    _, qp, traj = build_both(True, feasible=True)
    auto = as_chunked(qp)  # short horizon -> plain container (scan path)
    assert auto is qp
    res = admm.solve(auto, admm.Settings(), warm_x=jnp.asarray(traj))
    assert int(res.status) == ExitCode.kOptimal
