"""Pallas streaming Ruiz kernel parity vs the jnp lane Ruiz.

The jnp lane Ruiz is itself pinned against the vmapped reference
implementation (tests/test_admm_lane.py::test_ruiz_match), so kernel ==
jnp-lane == reference chain holds.  Interpret mode, B = 128.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osqp_solver_tpu.ops.admm_lane import _ruiz_equilibrate_lane_jnp
from osqp_solver_tpu.ops.ruiz_pallas import (
    ruiz_equilibrate_lane_kernel,
    ruiz_kernel_supported,
)

from test_admm_fused import build_wp_batch


@pytest.mark.parametrize("honest", [True, False])
@pytest.mark.parametrize("p_structure", ["vel_diag", "block"])
def test_ruiz_kernel_matches_jnp(honest, p_structure):
    lane = build_wp_batch(honest=honest).replace(p_structure=p_structure)
    assert ruiz_kernel_supported(lane)
    sc_ref, s_ref = _ruiz_equilibrate_lane_jnp(lane, 10)
    sc_k, s_k = ruiz_equilibrate_lane_kernel(lane, 10, interpret=True)
    np.testing.assert_allclose(
        np.asarray(s_k.D), np.asarray(s_ref.D), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(s_k.E), np.asarray(s_ref.E), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(s_k.c), np.asarray(s_ref.c), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(sc_k.q), np.asarray(sc_ref.q), rtol=1e-11, atol=1e-14
    )
    np.testing.assert_allclose(
        np.asarray(sc_k.l), np.asarray(sc_ref.l), rtol=1e-11, atol=1e-14
    )


def test_ruiz_kernel_few_iters():
    lane = build_wp_batch(honest=True)
    sc_ref, s_ref = _ruiz_equilibrate_lane_jnp(lane, 3)
    sc_k, s_k = ruiz_equilibrate_lane_kernel(lane, 3, interpret=True)
    np.testing.assert_allclose(
        np.asarray(s_k.D), np.asarray(s_ref.D), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(s_k.c), np.asarray(s_ref.c), rtol=1e-12
    )
