"""Block-tridiagonal Cholesky tests against dense numpy ground truth."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osqp_solver_tpu.ops.tridiag import (
    block_tridiag_factor,
    block_tridiag_matvec,
    block_tridiag_solve,
    block_tridiag_to_dense,
)


def random_spd_tridiag(key, W, B):
    k1, k2 = jax.random.split(key)
    diag = jax.random.normal(k1, (W, B, B), jnp.float64)
    diag = jnp.einsum("tij,tkj->tik", diag, diag) + 5.0 * jnp.eye(B)
    lower = 0.3 * jax.random.normal(k2, (max(W - 1, 0), B, B), jnp.float64)
    return diag, lower


def test_matvec_matches_dense():
    diag, lower = random_spd_tridiag(jax.random.PRNGKey(0), 5, 4)
    M = np.asarray(block_tridiag_to_dense(diag, lower))
    x = np.random.default_rng(0).normal(size=(5, 4))
    y = np.asarray(block_tridiag_matvec(diag, lower, jnp.asarray(x)))
    np.testing.assert_allclose(y.reshape(-1), M @ x.reshape(-1), rtol=1e-10)


def test_factor_solve_matches_dense():
    for seed, W, B in [(0, 1, 3), (1, 2, 4), (2, 7, 4), (3, 12, 6)]:
        diag, lower = random_spd_tridiag(jax.random.PRNGKey(seed), W, B)
        M = np.asarray(block_tridiag_to_dense(diag, lower))
        b = np.random.default_rng(seed).normal(size=(W, B))
        factor = block_tridiag_factor(diag, lower)
        x = np.asarray(block_tridiag_solve(factor, jnp.asarray(b)))
        expected = np.linalg.solve(M, b.reshape(-1))
        np.testing.assert_allclose(x.reshape(-1), expected, rtol=1e-8, atol=1e-10)


def test_factor_is_cholesky_of_dense():
    diag, lower = random_spd_tridiag(jax.random.PRNGKey(5), 6, 4)
    M = np.asarray(block_tridiag_to_dense(diag, lower))
    factor = block_tridiag_factor(diag, lower)
    # Reconstruct dense C from (chol, gain) and check C Cᵀ = M.
    W, B = 6, 4
    C = np.zeros_like(M)
    chol, gain = np.asarray(factor.chol), np.asarray(factor.gain)
    for t in range(W):
        C[t * B : (t + 1) * B, t * B : (t + 1) * B] = chol[t]
    for t in range(W - 1):
        C[(t + 1) * B : (t + 2) * B, t * B : (t + 1) * B] = gain[t]
    np.testing.assert_allclose(C @ C.T, M, rtol=1e-8, atol=1e-10)


def test_vmap_batches():
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    diags, lowers = jax.vmap(lambda k: random_spd_tridiag(k, 5, 4))(keys)
    bs = jax.random.normal(jax.random.PRNGKey(8), (4, 5, 4), jnp.float64)
    xs = jax.vmap(lambda d, lo, b: block_tridiag_solve(block_tridiag_factor(d, lo), b))(
        diags, lowers, bs
    )
    for i in range(4):
        M = np.asarray(block_tridiag_to_dense(diags[i], lowers[i]))
        np.testing.assert_allclose(
            np.asarray(xs[i]).reshape(-1),
            np.linalg.solve(M, np.asarray(bs[i]).reshape(-1)),
            rtol=1e-8,
        )

pytestmark = pytest.mark.quick  # fast tier: see CLAUDE.md
