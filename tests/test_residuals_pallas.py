"""Streaming residual/termination kernel parity vs the jnp matvec path.

The kernel's certificate matvecs use the scaled-operator identities
(A_base·dx_u = Einv·A_s(dx) etc.), exact up to one D·Dinv ulp — in the f64
interpret run here that is ~1e-15 relative, far inside the tolerances.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osqp_solver_tpu.ops import admm
from osqp_solver_tpu.ops.admm_fused import (
    build_coef_pack,
    fused_admm_chunk,
    pack_dxdy,
    pack_state,
)
from osqp_solver_tpu.ops.admm_lane import (
    _termination_quantities,
    init_state_lane,
    ruiz_equilibrate_lane,
)
from osqp_solver_tpu.ops.residuals_pallas import (
    build_residual_packs,
    termination_quantities_kernel,
)

from test_admm_fused import B, build_wp_batch


@pytest.mark.parametrize("honest", [True, False])
def test_quantities_match_jnp(honest):
    settings = dataclasses.replace(admm.Settings(), check_termination=3)
    lane = build_wp_batch(honest=honest)
    scaled, scaling = ruiz_equilibrate_lane(lane, settings.scaling)
    st = init_state_lane(scaled, settings)

    # Advance a few iterations so dx/dy/residuals are non-trivial.
    x2, z2, y2, dx2, dy2 = fused_admm_chunk(
        scaled, st.factor, st.x, st.z, st.y, st.rho_vec, st.done,
        settings, interpret=True,
    )
    st = st.replace(x=x2, z=z2, y=y2, dx=dx2, dy=dy2)

    ref = _termination_quantities(lane, scaled, scaling, st)

    sp = pack_state(scaled, st.x, st.z, st.y)
    dp = pack_dxdy(scaled, st.dx, st.dy)
    packs = build_residual_packs(scaled, scaling) + (scaling.cinv,)
    got = termination_quantities_kernel(
        scaled, sp, dp, build_coef_pack(scaled), packs, interpret=True
    )

    for name in ref._fields:
        r = np.asarray(getattr(ref, name))
        g = np.asarray(getattr(got, name))
        if name == "blew_up":
            np.testing.assert_array_equal(g, r)
        else:
            np.testing.assert_allclose(
                g, r, rtol=1e-9, atol=1e-12, err_msg=name
            )
