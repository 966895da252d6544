"""Pallas batched tridiagonal-solve kernel vs. the scan solver.

Runs in interpreter mode on the CPU test mesh (the kernel compiles natively
on TPU; `interpret=True` validates the same program logic).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osqp_solver_tpu.ops.pallas_tridiag import (
    from_lane_major,
    solve_lane_major,
    to_lane_major,
)
from osqp_solver_tpu.ops.tridiag import (
    block_tridiag_factor,
    block_tridiag_solve,
)

from test_tridiag import random_spd_tridiag


@pytest.mark.parametrize("W,B2,BATCH", [(5, 4, 3), (16, 12, 7), (1, 4, 2)])
def test_kernel_matches_scan(W, B2, BATCH):
    keys = jax.random.split(jax.random.PRNGKey(0), BATCH)
    diags, lowers = jax.vmap(lambda k: random_spd_tridiag(k, W, B2))(keys)
    diags = diags.astype(jnp.float32)
    lowers = lowers.astype(jnp.float32)
    rhs = jax.random.normal(jax.random.PRNGKey(1), (BATCH, W, B2), jnp.float32)

    factors = jax.vmap(block_tridiag_factor)(diags, lowers)
    expected = jax.vmap(block_tridiag_solve)(factors, rhs)

    chol_lm = to_lane_major(factors.chol)  # (W, B2, B2, BATCH)
    gain_lm = to_lane_major(factors.gain)
    rhs_lm = to_lane_major(rhs)
    out = solve_lane_major(chol_lm, gain_lm, rhs_lm, interpret=True)
    got = from_lane_major(out)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=2e-4, atol=2e-4
    )


def test_kernel_multi_tile_padding():
    """Batch > 128 exercises the lane-tile grid; non-multiple exercises
    padding."""
    W, B2, BATCH = 4, 4, 130
    keys = jax.random.split(jax.random.PRNGKey(5), BATCH)
    diags, lowers = jax.vmap(lambda k: random_spd_tridiag(k, W, B2))(keys)
    diags = diags.astype(jnp.float32)
    lowers = lowers.astype(jnp.float32)
    rhs = jax.random.normal(jax.random.PRNGKey(6), (BATCH, W, B2), jnp.float32)
    factors = jax.vmap(block_tridiag_factor)(diags, lowers)
    expected = jax.vmap(block_tridiag_solve)(factors, rhs)
    out = solve_lane_major(
        to_lane_major(factors.chol),
        to_lane_major(factors.gain),
        to_lane_major(rhs),
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(from_lane_major(out)), np.asarray(expected), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("W,B2,BATCH", [(6, 4, 3), (10, 12, 5), (1, 4, 2)])
def test_factor_kernel_matches_scan(W, B2, BATCH):
    from osqp_solver_tpu.ops.pallas_tridiag import factor_lane_major

    keys = jax.random.split(jax.random.PRNGKey(2), BATCH)
    diags, lowers = jax.vmap(lambda k: random_spd_tridiag(k, W, B2))(keys)
    diags = diags.astype(jnp.float32)
    lowers = lowers.astype(jnp.float32)
    expected = jax.vmap(block_tridiag_factor)(diags, lowers)
    chol_lm, gain_lm = factor_lane_major(
        to_lane_major(diags), to_lane_major(lowers), interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(from_lane_major(chol_lm)),
        np.asarray(expected.chol),
        rtol=3e-4, atol=3e-4,
    )
    if W > 1:
        np.testing.assert_allclose(
            np.asarray(from_lane_major(gain_lm)),
            np.asarray(expected.gain),
            rtol=3e-4, atol=3e-4,
        )


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="hardware DMA-pipeline parity; run with OSQP_TPU_TESTS=1 on a TPU",
)
def test_kernels_on_hardware():
    """Compiled-kernel (not interpret-mode) parity vs. the scan solver on a
    real TPU: covers the DMA double-buffering / semaphore scheduling that
    interpreter mode cannot exercise (ADVICE r1: a pipelining regression was
    previously only caught by ad-hoc benchmark runs)."""
    W, B2, BATCH = 40, 12, 256
    keys = jax.random.split(jax.random.PRNGKey(11), BATCH)
    diags, lowers = jax.vmap(lambda k: random_spd_tridiag(k, W, B2))(keys)
    diags = diags.astype(jnp.float32)
    lowers = lowers.astype(jnp.float32)
    rhs = jax.random.normal(jax.random.PRNGKey(12), (BATCH, W, B2), jnp.float32)

    factors = jax.vmap(block_tridiag_factor)(diags, lowers)
    expected = jax.vmap(block_tridiag_solve)(factors, rhs)

    from osqp_solver_tpu.ops.pallas_tridiag import factor_lane_major

    chol_lm, gain_lm = factor_lane_major(
        to_lane_major(diags), to_lane_major(lowers), interpret=False
    )
    np.testing.assert_allclose(
        np.asarray(from_lane_major(chol_lm)), np.asarray(factors.chol),
        rtol=3e-4, atol=3e-4,
    )
    out = solve_lane_major(chol_lm, gain_lm, to_lane_major(rhs), interpret=False)
    np.testing.assert_allclose(
        np.asarray(from_lane_major(out)), np.asarray(expected),
        rtol=5e-4, atol=5e-4,
    )


def test_factor_then_solve_round_trip():
    """factor kernel + solve kernel solve the original system."""
    from osqp_solver_tpu.ops.pallas_tridiag import factor_lane_major
    from osqp_solver_tpu.ops.tridiag import block_tridiag_matvec

    W, B2, BATCH = 7, 6, 4
    keys = jax.random.split(jax.random.PRNGKey(3), BATCH)
    diags, lowers = jax.vmap(lambda k: random_spd_tridiag(k, W, B2))(keys)
    diags = diags.astype(jnp.float32)
    lowers = lowers.astype(jnp.float32)
    rhs = jax.random.normal(jax.random.PRNGKey(4), (BATCH, W, B2), jnp.float32)
    chol_lm, gain_lm = factor_lane_major(
        to_lane_major(diags), to_lane_major(lowers), interpret=True
    )
    x = from_lane_major(
        solve_lane_major(chol_lm, gain_lm, to_lane_major(rhs), interpret=True)
    )
    for b in range(BATCH):
        resid = block_tridiag_matvec(diags[b], lowers[b], x[b]) - rhs[b]
        assert float(jnp.max(jnp.abs(resid))) < 1e-3
