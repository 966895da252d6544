"""Ruiz equilibration unit tests."""
import jax
import jax.numpy as jnp
import numpy as np

from osqp_solver_tpu.ops.ruiz import ruiz_equilibrate

from test_admm import random_qp


def test_equilibrated_norms_near_one():
    qp = random_qp(jax.random.PRNGKey(0), n=16, m=24)
    # make it badly scaled
    scale = jnp.exp(jnp.linspace(-3, 3, 16))
    qp = qp.replace(
        P=scale[:, None] * qp.P * scale[None, :],
        A=qp.A * scale[None, :],
        q=qp.q * scale,
    )
    scaled, s = ruiz_equilibrate(qp, 10)
    cols = np.asarray(
        jnp.maximum(scaled.P_col_absmax(), scaled.A_col_absmax())
    )
    rows = np.asarray(scaled.A_row_absmax())
    assert cols.max() < 10 and cols.min() > 0.05
    assert rows.max() < 10 and rows.min() > 0.05
    # scaling consistency: scaled == scale_data(D, E, c) of the original
    re = qp.scale_data(s.D, s.E, s.c)
    np.testing.assert_allclose(np.asarray(re.A), np.asarray(scaled.A), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(re.P), np.asarray(scaled.P), rtol=1e-10)


def test_badly_scaled_qp_solves():
    from osqp_solver_tpu.ops import admm
    from osqp_solver_tpu.ops.status import ExitCode
    from test_admm import check_kkt

    qp = random_qp(jax.random.PRNGKey(1), n=12, m=18)
    scale = jnp.exp(jnp.linspace(-2.5, 2.5, 12))
    qp = qp.replace(
        P=scale[:, None] * qp.P * scale[None, :],
        A=qp.A * scale[None, :],
        q=qp.q * scale,
    )
    res = admm.solve(qp)
    assert int(res.status) == ExitCode.kOptimal
    check_kkt(qp, res, eps=1e-2)
