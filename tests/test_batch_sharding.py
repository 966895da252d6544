"""Batch-parallel sharded solve tests (SURVEY.md §2.3 batch parallelism):
vmapped ADMM sharded over the mesh batch axis on the 8-device CPU mesh."""
import jax
import numpy as np

from osqp_solver_tpu.ops import admm
from osqp_solver_tpu.ops.status import ExitCode
from osqp_solver_tpu.parallel.batch import solve_batch, solve_batch_sharded
from osqp_solver_tpu.parallel.mesh import make_mesh

from test_admm import check_kkt, random_qp


def test_sharded_matches_unsharded():
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    qps = jax.vmap(lambda k: random_qp(k, n=12, m=18))(keys)
    mesh = make_mesh(batch=8, horizon=1)
    res_ref = solve_batch(qps)
    res_shard = solve_batch_sharded(qps, mesh)
    assert np.all(np.asarray(res_shard.status) == ExitCode.kOptimal)
    np.testing.assert_allclose(
        np.asarray(res_shard.x), np.asarray(res_ref.x), atol=1e-9
    )
    for i in range(16):
        check_kkt(
            jax.tree_util.tree_map(lambda a: a[i], qps),
            jax.tree_util.tree_map(lambda a: a[i], res_shard),
        )


def test_sharded_session_settings():
    keys = jax.random.split(jax.random.PRNGKey(5), 8)
    qps = jax.vmap(lambda k: random_qp(k, n=8, m=10))(keys)
    mesh = make_mesh(batch=8, horizon=1)
    res = solve_batch_sharded(qps, mesh, admm.Settings(scaling=0))
    assert np.all(np.asarray(res.status) == ExitCode.kOptimal)


def test_sharded_trajectory_qps():
    """Structured (block-banded) trajectory QPs shard over the batch axis
    too — the production configuration (BASELINE config 3 at scale)."""
    import jax.numpy as jnp

    from osqp_solver_tpu.gomp.trajectory_qp import (
        empty_trajectory_qp,
        with_gomp_boxes,
    )

    W, N = 12, 3
    base = empty_trajectory_qp(W, N, gripper_flags=(), n_obstacles=0)
    pos = (jnp.full(N, -10.0), jnp.full(N, 10.0))
    vel = (jnp.full(N, -1.0), jnp.full(N, 1.0))
    acc = (jnp.full(N, -2.0), jnp.full(N, 2.0))

    def one(i):
        return with_gomp_boxes(
            base, 0.01 * i * jnp.ones(N), jnp.ones(N), pos, vel, acc
        )

    qps = jax.vmap(one)(jnp.arange(8.0))
    mesh = make_mesh(batch=8, horizon=1)
    res = solve_batch_sharded(qps, mesh)
    assert np.all(np.asarray(res.status) == ExitCode.kOptimal)
    ref = solve_batch(qps)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x), atol=1e-8)
