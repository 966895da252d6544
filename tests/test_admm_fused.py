"""Fused ADMM chunk kernel (ops/admm_fused.py) parity vs the unfused loop.

Runs the Pallas kernel in interpret mode on CPU (B = 128, one lane tile)
and pins it against ``check_termination`` applications of
``admm_lane._iteration`` — same OSQP iteration semantics
(/root/reference/src/osqp-wrapper.h; SURVEY §3.4 hot loop).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osqp_solver_tpu import RobotBall
from osqp_solver_tpu.gomp.geometry import HorizontalLine
from osqp_solver_tpu.gomp.trajectory import calc_warm_start_jnp
from osqp_solver_tpu.gomp.trajectory_qp import (
    empty_trajectory_qp,
    linearize_workspace,
    with_gomp_boxes,
)
from osqp_solver_tpu.gomp.trajectory_qp_lane import to_lane
from osqp_solver_tpu.ops import admm
from osqp_solver_tpu.ops.admm_fused import fused_admm_chunk
from osqp_solver_tpu.ops.admm_lane import (
    _iteration,
    init_state_lane,
    ruiz_equilibrate_lane,
    solve_batched_lane,
)
from osqp_solver_tpu.ops.status import ExitCode

W, N, B = 8, 3, 128
RNG = np.random.default_rng(11)
JAC0 = RNG.normal(size=(3, N))


def build_wp_batch(honest=True, dtype=jnp.float64):
    fk0 = lambda s: 0.1 * jnp.array([jnp.sum(s), jnp.sum(s**2), s[0]])
    jac0 = lambda s: jnp.asarray(JAC0, s.dtype) + 0.01 * s[None, :]
    fk1 = lambda s: s[:3]
    jac1 = lambda s: jnp.eye(3, N, dtype=s.dtype)
    balls = (
        RobotBall(fk=fk0, jacobian=jac0, radius=0.15, is_gripper=False),
        RobotBall(fk=fk1, jacobian=jac1, radius=0.05, is_gripper=True),
    )
    if honest:
        obstacles = [HorizontalLine.create((0.0, 1.0), (100.0, 100.0, 0.15))]
        flags = (False, True)
    else:
        obstacles, flags = [], ()
    con3d = (jnp.full(3, -50.0, dtype), jnp.full(3, 50.0, dtype))
    pos = (jnp.full(N, -10.0, dtype), jnp.full(N, 10.0, dtype))
    vel = (jnp.full(N, -1.0, dtype), jnp.full(N, 1.0, dtype))
    acc = (jnp.full(N, -2.0, dtype), jnp.full(N, 2.0, dtype))
    base = empty_trajectory_qp(
        W, N, gripper_flags=flags, n_obstacles=len(obstacles), dtype=dtype
    )

    def one(i):
        start = 0.02 * jnp.sin(jnp.arange(N, dtype=dtype) + i)
        end = 1.0 + 0.02 * jnp.cos(jnp.arange(N, dtype=dtype) * 1.3 + i)
        qp = with_gomp_boxes(base, start, end, pos, vel, acc)
        if honest:
            warm = calc_warm_start_jnp(start, end, W)
            qp = linearize_workspace(qp, balls, obstacles, con3d, warm)
        return qp

    lane = to_lane(jax.vmap(one)(jnp.arange(B, dtype=dtype)))
    return lane.replace(row_layout="waypoint")


@pytest.mark.parametrize("factor_form", ["gain", "hrec"])
@pytest.mark.parametrize("honest", [True, False])
def test_fused_chunk_matches_unfused_iterations(honest, factor_form):
    settings = dataclasses.replace(
        admm.Settings(), check_termination=3, factor_form=factor_form
    )
    lane = build_wp_batch(honest=honest)
    scaled, scaling = ruiz_equilibrate_lane(lane, settings.scaling)
    st = init_state_lane(scaled, settings)
    # Freeze a few problems to exercise the done mask.
    done = jnp.zeros((B,), bool).at[5].set(True).at[77].set(True)
    st = st.replace(done=done, dx=st.dx + 0.25, dy=st.dy + 0.5)

    # Reference: n unfused iterations.
    ref = st
    for _ in range(settings.check_termination):
        ref = _iteration(scaled, ref.replace(factor=None), st.factor, settings)

    x2, z2, y2, dx2, dy2 = fused_admm_chunk(
        scaled, st.factor, st.x, st.z, st.y,
        st.rho_vec, st.done, settings, interpret=True,
    )
    tol = dict(rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(ref.x), **tol)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(ref.z), **tol)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(ref.y), **tol)
    # dx/dy: last ACTIVE iteration's deltas; zeros for frozen problems
    # (their certificates/status are already fixed).
    mask = np.asarray(~done)
    np.testing.assert_allclose(
        np.asarray(dx2)[:, mask], np.asarray(ref.dx)[:, mask], **tol
    )
    np.testing.assert_allclose(
        np.asarray(dy2)[:, mask], np.asarray(ref.dy)[:, mask], **tol
    )
    np.testing.assert_array_equal(np.asarray(dx2)[:, 5], 0.0)
    np.testing.assert_array_equal(np.asarray(dy2)[:, 77], 0.0)
    # Frozen problems kept their pre-chunk state bit-for-bit.
    for new, old in ((x2, st.x), (z2, st.z), (y2, st.y)):
        np.testing.assert_array_equal(
            np.asarray(new[:, 5]), np.asarray(old[:, 5])
        )


def test_gain_is_upper_triangular():
    """The packed-factor assumption: gain = L·C⁻ᵀ is exactly upper-
    triangular for the trajectory QP family (L couples q_{t+1}/v_{t+1} only
    to same-index q_t/v_t diagonals)."""
    lane = build_wp_batch(honest=True)
    from osqp_solver_tpu.ops.admm_lane import ruiz_equilibrate_lane as _rz

    scaled, _ = _rz(lane, 10)
    rho = jnp.full((scaled.m, B), 0.1, scaled.q_vec.dtype)
    f = scaled.kkt_factor(rho, 1e-6)
    g = np.asarray(f.gain)  # (W-1, 2N, 2N, B)
    tril = np.tril_indices(2 * N, k=-1)
    assert np.max(np.abs(g[:, tril[0], tril[1], :])) == 0.0


@pytest.mark.parametrize("factor_form", ["gain", "hrec"])
@pytest.mark.parametrize("warmup", [0, 6])
def test_fused_solve_end_to_end(factor_form, warmup):
    settings = dataclasses.replace(
        admm.Settings(), check_termination=10, fused_chunk="on",
        factor_form=factor_form, termination_warmup=warmup,
    )
    lane = build_wp_batch(honest=True)
    ref = solve_batched_lane(
        lane, dataclasses.replace(settings, fused_chunk="off")
    )
    got = solve_batched_lane(lane, settings)
    np.testing.assert_array_equal(np.asarray(got.status), np.asarray(ref.status))
    assert np.all(np.asarray(got.status) == ExitCode.kOptimal)
    np.testing.assert_array_equal(
        np.asarray(got.iterations), np.asarray(ref.iterations)
    )
    np.testing.assert_allclose(
        np.asarray(got.x), np.asarray(ref.x), rtol=1e-7, atol=1e-9
    )


def test_factor_warmup_stream_parity():
    """The 2-byte warmup factor stream (Settings.factor_warmup_stream):
    the fused kernel streams an f16 cholp and upcasts in-register —
    value-equivalent to the flat path's round-trip rounding — and the
    cadence (full f32 factor) still terminates on TRUE residuals, so
    statuses/iterations match the flat driver exactly and every problem
    is optimal-to-tolerance."""
    settings = dataclasses.replace(
        admm.Settings(), check_termination=10, fused_chunk="on",
        factor_form="hrec", termination_warmup=6,
        factor_warmup_stream="f16",
    )
    lane = build_wp_batch(honest=True)
    ref = solve_batched_lane(
        lane, dataclasses.replace(settings, fused_chunk="off")
    )
    got = solve_batched_lane(lane, settings)
    assert np.all(np.asarray(got.status) == ExitCode.kOptimal)
    np.testing.assert_array_equal(
        np.asarray(got.status), np.asarray(ref.status))
    np.testing.assert_array_equal(
        np.asarray(got.iterations), np.asarray(ref.iterations))
    np.testing.assert_allclose(
        np.asarray(got.x), np.asarray(ref.x), rtol=1e-5, atol=1e-6
    )
    # The stream genuinely perturbs the warmup (it is not a no-op): the
    # trajectory differs from the unstreamed solve beyond f32 noise,
    # while the accepted solutions still agree to solver tolerance.
    clean = solve_batched_lane(
        lane, dataclasses.replace(settings, factor_warmup_stream="none")
    )
    assert float(np.max(np.abs(np.asarray(got.x) - np.asarray(clean.x)))) > 1e-12
    np.testing.assert_allclose(
        np.asarray(got.x), np.asarray(clean.x), atol=5e-3
    )


def test_factor_warmup_stream_gain_form():
    """The gain-form fused path under a real 2-byte warmup stream: only the
    chol pack may be cast (the kernel's gain scratch buffer is allocated at
    the working dtype and read without an upcast — casting the gain pack
    would pair a 2-byte HBM source with an f32 VMEM buffer).  Pins the
    admm_lane cast-only-cholp fix: the solve must run and stay optimal."""
    settings = dataclasses.replace(
        admm.Settings(), check_termination=10, fused_chunk="on",
        factor_form="gain", termination_warmup=6,
        factor_warmup_stream="bf16",
    )
    lane = build_wp_batch(honest=True)
    got = solve_batched_lane(lane, settings)
    assert np.all(np.asarray(got.status) == ExitCode.kOptimal)


@pytest.mark.parametrize("factor_form", ["gain", "hrec"])
def test_fused_solve_with_rho_adaptation(factor_form):
    """A mid-solve ρ adaptation forces a refactorization between chunks —
    the refactor must regenerate the factor in the form the chunk kernel
    consumes (packed gain / gain-free) and stay at parity with the unfused
    driver, which adapts on the identical schedule."""
    settings = dataclasses.replace(
        admm.Settings(), check_termination=4, fused_chunk="on",
        factor_form=factor_form, adaptive_rho=True, adaptive_rho_interval=4,
        # Start far from the tuned ρ so adaptation actually fires.
        rho=1.0,
    )
    lane = build_wp_batch(honest=True)
    ref = solve_batched_lane(
        lane, dataclasses.replace(settings, fused_chunk="off")
    )
    got = solve_batched_lane(lane, settings)
    assert np.all(np.asarray(got.status) == ExitCode.kOptimal)
    np.testing.assert_array_equal(np.asarray(got.status), np.asarray(ref.status))
    np.testing.assert_array_equal(
        np.asarray(got.iterations), np.asarray(ref.iterations)
    )
    np.testing.assert_allclose(
        np.asarray(got.x), np.asarray(ref.x), rtol=1e-6, atol=1e-8
    )


@pytest.mark.parametrize("factor_form", ["gain", "hrec"])
@pytest.mark.parametrize("honest", [True, False])
def test_emit_term_matches_separate_kernel(honest, factor_form):
    """The termination accumulators emitted by the chunk kernel's final
    backward pass must match the standalone streaming termination kernel
    field-for-field (incl. every infeasibility-certificate quantity)."""
    from osqp_solver_tpu.ops.admm_fused import (
        build_coef_pack,
        build_lu_pack,
        fused_admm_chunk,
        pack_factor,
        term_fused_supported,
    )
    from osqp_solver_tpu.ops.residuals_pallas import (
        assemble_term_quantities,
        build_residual_packs,
        termination_quantities_kernel,
    )

    lane = build_wp_batch(honest=honest)
    settings = dataclasses.replace(
        admm.Settings(), check_termination=4, fused_chunk="on",
        factor_form=factor_form,
    )
    assert term_fused_supported(lane, settings)
    scaled, scaling = ruiz_equilibrate_lane(lane, settings.scaling)
    st = init_state_lane(scaled, settings)
    coef = build_coef_pack(scaled)
    lu = build_lu_pack(scaled)
    pf = pack_factor(scaled, st.factor)
    packs = build_residual_packs(scaled, scaling)
    rowc, varc, Pdp, Plf, norm_Dq = packs
    Rp = scaled.rows_per_waypoint_padded
    # Mark a few problems done up front: frozen problems must keep their
    # state and zero their deltas in the reductions too.
    done = jnp.zeros((lane.batch,), bool).at[::7].set(True)

    sp_ref, dp_ref = fused_admm_chunk(
        scaled, None, st.x, st.z, st.y, st.rho_vec, done, settings,
        coef=coef, lu=lu, packed_factor=pf, state_pack=None,
        return_packed=True, interpret=True,
    )[5:7]
    tq_ref = termination_quantities_kernel(
        scaled, sp_ref, dp_ref, coef, packs + (scaling.cinv,),
        interpret=True,
    )

    sp, dp, acc = fused_admm_chunk(
        scaled, None, st.x, st.z, st.y, st.rho_vec, done, settings,
        coef=coef, lu=lu, packed_factor=pf,
        state_pack=__import__("osqp_solver_tpu.ops.admm_fused",
                              fromlist=["pack_state"]).pack_state(
            scaled, st.x, st.z, st.y
        ),
        term_packs=(rowc[:, : 2 * Rp], varc, Pdp, Plf), interpret=True,
    )
    tq = assemble_term_quantities(acc, scaling.cinv, norm_Dq)

    np.testing.assert_allclose(np.asarray(sp), np.asarray(sp_ref), rtol=1e-12)
    for name in tq._fields:
        a, b = np.asarray(getattr(tq, name)), np.asarray(getattr(tq_ref, name))
        np.testing.assert_allclose(
            a, b, rtol=1e-9, atol=1e-12, err_msg=f"field {name}"
        )


def test_block_p_structure_fused_driver():
    """With a dense-block P structure the driver must fall back to the
    generic packed factor + standalone termination kernel (no emit_term,
    no factor_packed_lane) and still match the unfused path."""
    from osqp_solver_tpu.ops.admm_fused import term_fused_supported
    from osqp_solver_tpu.ops.kkt_factor_pallas import factor_packed_supported

    lane = build_wp_batch(honest=True).replace(p_structure="block")
    settings = dataclasses.replace(
        admm.Settings(), check_termination=5, fused_chunk="on",
        # hrec needs vel-diag P: requesting it here must silently fall
        # back to the gain form.
        factor_form="hrec",
    )
    assert not term_fused_supported(lane, settings)
    assert not factor_packed_supported(lane)
    got = solve_batched_lane(lane, settings)
    ref = solve_batched_lane(
        lane, dataclasses.replace(settings, fused_chunk="off")
    )
    np.testing.assert_array_equal(np.asarray(got.status), np.asarray(ref.status))
    assert np.all(np.asarray(got.status) == ExitCode.kOptimal)
    np.testing.assert_allclose(
        np.asarray(got.x), np.asarray(ref.x), rtol=1e-8, atol=1e-8
    )
