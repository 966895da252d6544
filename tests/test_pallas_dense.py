"""Pallas batched dense Cholesky/solve kernels vs. the XLA path.

Interpreter mode on the CPU test mesh validates the kernel program logic;
``test_kernels_on_hardware`` (OSQP_TPU_TESTS=1) covers the compiled path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osqp_solver_tpu.ops.pallas_dense import (
    dense_chol_solve,
    dense_cholesky,
    factor_lane_major,
    solve_lane_major,
)


def random_spd(key, n, dtype=jnp.float32):
    M = jax.random.normal(key, (n, n), dtype)
    return M @ M.T / n + 0.5 * jnp.eye(n, dtype=dtype)


@pytest.mark.parametrize("n,batch", [(8, 3), (24, 5), (64, 2)])
def test_factor_kernel_matches_xla(n, batch):
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    Ms = jax.vmap(lambda k: random_spd(k, n))(keys)
    expected = jax.vmap(jnp.linalg.cholesky)(Ms)

    Lt = factor_lane_major(jnp.moveaxis(Ms, 0, -1), interpret=True)
    got = jnp.moveaxis(Lt, -1, 0).swapaxes(-1, -2)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("n,batch", [(8, 3), (24, 5), (64, 2)])
def test_solve_kernel_matches_xla(n, batch):
    keys = jax.random.split(jax.random.PRNGKey(1), batch)
    Ms = jax.vmap(lambda k: random_spd(k, n))(keys)
    rhs = jax.random.normal(jax.random.PRNGKey(2), (batch, n), jnp.float32)
    Ls = jax.vmap(jnp.linalg.cholesky)(Ms)
    expected = jax.vmap(jnp.linalg.solve)(Ms, rhs)

    Lt = jnp.moveaxis(Ls.swapaxes(-1, -2), 0, -1)
    out = solve_lane_major(Lt, jnp.moveaxis(rhs, 0, -1), interpret=True)
    got = jnp.moveaxis(out, -1, 0)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=2e-3, atol=2e-3
    )


def test_custom_vmap_entry_points_cpu_fallback():
    """On CPU the vmap rule takes the XLA path — semantics identical."""
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    Ms = jax.vmap(lambda k: random_spd(k, 12))(keys)
    rhs = jax.random.normal(jax.random.PRNGKey(4), (4, 12), jnp.float32)
    L = jax.vmap(dense_cholesky)(Ms)
    np.testing.assert_allclose(
        np.asarray(L),
        np.asarray(jax.vmap(jnp.linalg.cholesky)(Ms)),
        rtol=1e-6,
        atol=1e-6,
    )
    x = jax.vmap(dense_chol_solve)(L, rhs)
    np.testing.assert_allclose(
        np.asarray(jax.vmap(lambda M, b: M @ b)(Ms, x)),
        np.asarray(rhs),
        rtol=1e-4,
        atol=1e-4,
    )


def test_unbatched_entry_points():
    M = random_spd(jax.random.PRNGKey(5), 16)
    rhs = jax.random.normal(jax.random.PRNGKey(6), (16,), jnp.float32)
    L = dense_cholesky(M)
    np.testing.assert_allclose(
        np.asarray(L), np.asarray(jnp.linalg.cholesky(M)), rtol=1e-6, atol=1e-6
    )
    x = dense_chol_solve(L, rhs)
    np.testing.assert_allclose(
        np.asarray(M @ x), np.asarray(rhs), rtol=1e-4, atol=1e-4
    )


def test_lane_and_sublane_padding():
    """n not a multiple of 8 and batch not a multiple of 128 both pad
    cleanly (dead lanes/rows must not inject inf/nan)."""
    n, batch = 13, 5
    keys = jax.random.split(jax.random.PRNGKey(7), batch)
    Ms = jax.vmap(lambda k: random_spd(k, n))(keys)
    rhs = jax.random.normal(jax.random.PRNGKey(8), (batch, n), jnp.float32)
    Lt = factor_lane_major(jnp.moveaxis(Ms, 0, -1), interpret=True)
    out = solve_lane_major(Lt, jnp.moveaxis(rhs, 0, -1), interpret=True)
    got = jnp.moveaxis(out, -1, 0)
    assert np.all(np.isfinite(np.asarray(got)))
    np.testing.assert_allclose(
        np.asarray(jax.vmap(lambda M, b: M @ b)(Ms, got)),
        np.asarray(rhs),
        rtol=2e-3,
        atol=2e-3,
    )


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="hardware kernel parity; run with OSQP_TPU_TESTS=1 on a TPU",
)
def test_kernels_on_hardware():
    n, batch = 64, 200  # exercises lane padding on hardware
    keys = jax.random.split(jax.random.PRNGKey(9), batch)
    Ms = jax.vmap(lambda k: random_spd(k, n))(keys)
    rhs = jax.random.normal(jax.random.PRNGKey(10), (batch, n), jnp.float32)
    L = jax.jit(jax.vmap(dense_cholesky))(Ms)
    np.testing.assert_allclose(
        np.asarray(L),
        np.asarray(jax.vmap(jnp.linalg.cholesky)(Ms)),
        rtol=2e-4,
        atol=2e-4,
    )
    x = jax.jit(jax.vmap(dense_chol_solve))(L, rhs)
    # Residual matvec must use exact f32 accumulation — the default TPU
    # matmul path (bf16 passes) injects ~1e-2 error into the CHECK itself.
    hi = jax.lax.Precision.HIGHEST
    resid = jax.vmap(lambda M, b: jnp.matmul(M, b, precision=hi))(Ms, x)
    np.testing.assert_allclose(
        np.asarray(resid), np.asarray(rhs), rtol=5e-3, atol=5e-3
    )
