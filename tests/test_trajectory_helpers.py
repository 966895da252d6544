"""Trajectory helper mirrors (utils.h:50-96) unit tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from osqp_solver_tpu.gomp.trajectory import (
    calc_warm_start,
    calc_warm_start_jnp,
    linspace_configs,
    map_joint_trajectory_to_xyz,
    smoothness_objective,
    tri_diagonal_matrix,
)


def test_tri_diagonal_matrix_semantics():
    """utils.h:50-64: zero before offset; a on diag, b at ±diagonal_num
    (upper when i+d < n, lower when i-d >= offset)."""
    M = tri_diagonal_matrix(2.0, -1.0, 6, offset=2, diagonal_num=2)
    expected = np.zeros((6, 6))
    for i in range(2, 6):
        expected[i, i] = 2.0
        if i + 2 < 6:
            expected[i, i + 2] = -1.0
        if i - 2 >= 2:
            expected[i, i - 2] = -1.0
    np.testing.assert_allclose(M, expected)


def test_smoothness_objective_is_velocity_laplacian():
    P = smoothness_objective(3, 2)
    # zero on the position half
    assert np.all(P[:6, :] == 0) and np.all(P[:, :6] == 0)
    # tridiag(2,-1) with block distance N on the velocity half
    v = P[6:, 6:]
    np.testing.assert_allclose(np.diag(v), 2.0)
    np.testing.assert_allclose(np.diag(v, 2), -1.0)


def test_linspace_matches_reference_formula():
    """utils.h:72-82: step = (b-a)/(n-1); row i = a + i*step."""
    a, b = np.array([0.0, 1.0]), np.array([1.0, -1.0])
    out = linspace_configs(a, b, 5).reshape(5, 2)
    np.testing.assert_allclose(out[0], a)
    np.testing.assert_allclose(out[-1], b)
    np.testing.assert_allclose(out[2], (a + b) / 2)


def test_warm_start_layouts_match():
    a, b = np.zeros(3), np.ones(3)
    w_np = calc_warm_start(a, b, 6)
    w_j = np.asarray(calc_warm_start_jnp(jnp.asarray(a), jnp.asarray(b), 6))
    np.testing.assert_allclose(w_np, w_j, atol=1e-12)
    assert np.all(w_np[18:] == 0)  # zero velocities


def test_map_joint_trajectory_to_xyz():
    """utils.h:84-96: FK applied to the position half only."""
    fk = lambda q: jnp.concatenate([q[:2], jnp.sum(q, keepdims=True)])
    traj = jnp.concatenate([jnp.arange(8.0), 100 + jnp.arange(8.0)])  # W=4, N=2
    pts = np.asarray(map_joint_trajectory_to_xyz(traj, fk, 2))
    assert pts.shape == (4, 3)
    np.testing.assert_allclose(pts[1], [2.0, 3.0, 5.0])

pytestmark = pytest.mark.quick  # fast tier: see CLAUDE.md
