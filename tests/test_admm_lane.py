"""Lane-major (batch-last) ADMM driver parity vs the vmapped batch-leading path.

The lane containers/driver (`gomp/trajectory_qp_lane.py`, `ops/admm_lane.py`)
must reproduce the vmapped reference path (`ops/admm.py::solve_batched`)
operator-for-operator and solve-for-solve: same OSQP semantics
(/root/reference/src/osqp-wrapper.h), different memory layout.
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
from osqp_solver_tpu.ops.admm_lane import (
    init_state_lane,
    ruiz_equilibrate_lane,
    solve_batched_lane,
)
from osqp_solver_tpu.ops.ruiz import ruiz_equilibrate
from osqp_solver_tpu.ops.status import ExitCode

# Mid tier: solver+planner integration paths the quick tier skips
# (pyproject `mid` marker; see CLAUDE.md).
pytestmark = pytest.mark.mid

quick = pytest.mark.quick  # fast tier: see CLAUDE.md

W, N, B = 8, 3, 4
RNG = np.random.default_rng(7)
JAC0 = RNG.normal(size=(3, N))


def make_balls():
    fk0 = lambda s: 0.1 * jnp.array([jnp.sum(s), jnp.sum(s**2), s[0]])
    jac0 = lambda s: jnp.asarray(JAC0, s.dtype) + 0.01 * s[None, :]
    fk1 = lambda s: s[:3]
    jac1 = lambda s: jnp.eye(3, N, dtype=s.dtype)
    return (
        RobotBall(fk=fk0, jacobian=jac0, radius=0.15, is_gripper=False),
        RobotBall(fk=fk1, jacobian=jac1, radius=0.05, is_gripper=True),
    )


def build_batch(honest=True, dtype=jnp.float64, tight_obstacle=False):
    balls = make_balls()
    if honest and tight_obstacle:
        obstacles = [HorizontalLine.create((0.0, 1.0), (0.35, 0.0, 0.15))]
    elif honest:
        # Far away: obstacle rows stay dummy (±INF) but the row structure and
        # gripper workspace rows are live — feasible for the fake kinematics.
        obstacles = [HorizontalLine.create((0.0, 1.0), (100.0, 100.0, 0.15))]
    else:
        obstacles = []
    con3d = (jnp.full(3, -50.0, dtype), jnp.full(3, 50.0, dtype))
    pos = (jnp.full(N, -10.0, dtype), jnp.full(N, 10.0, dtype))
    vel = (jnp.full(N, -1.0, dtype), jnp.full(N, 1.0, dtype))
    acc = (jnp.full(N, -2.0, dtype), jnp.full(N, 2.0, dtype))
    flags = (False, True) if honest else ()
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

    return jax.vmap(one)(jnp.arange(B, dtype=dtype))


def bl(x):
    """batch-last -> batch-leading for comparison."""
    return np.moveaxis(np.asarray(x), -1, 0)


@pytest.fixture(scope="module")
def batches():
    qps = build_batch(honest=True)
    return qps, to_lane(qps)


def test_vectors_roundtrip(batches):
    qps, lane = batches
    np.testing.assert_array_equal(bl(lane.l), np.asarray(jax.vmap(lambda q: q.l)(qps)))
    np.testing.assert_array_equal(bl(lane.u), np.asarray(jax.vmap(lambda q: q.u)(qps)))
    np.testing.assert_array_equal(bl(lane.q), np.asarray(jax.vmap(lambda q: q.q)(qps)))


def test_matvecs_match(batches):
    qps, lane = batches
    x = jnp.asarray(RNG.normal(size=(B, lane.n)))
    y = jnp.asarray(RNG.normal(size=(B, lane.m)))
    xl = jnp.moveaxis(x, 0, -1)
    yl = jnp.moveaxis(y, 0, -1)
    np.testing.assert_allclose(
        bl(lane.A_matvec(xl)), np.asarray(jax.vmap(lambda q, v: q.A_matvec(v))(qps, x)),
        rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(
        bl(lane.AT_matvec(yl)), np.asarray(jax.vmap(lambda q, v: q.AT_matvec(v))(qps, y)),
        rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(
        bl(lane.P_matvec(xl)), np.asarray(jax.vmap(lambda q, v: q.P_matvec(v))(qps, x)),
        rtol=1e-12, atol=1e-12,
    )


def test_norms_match(batches):
    qps, lane = batches
    np.testing.assert_allclose(
        bl(lane.A_col_absmax()), np.asarray(jax.vmap(lambda q: q.A_col_absmax())(qps)),
        rtol=1e-14,
    )
    np.testing.assert_allclose(
        bl(lane.A_row_absmax()), np.asarray(jax.vmap(lambda q: q.A_row_absmax())(qps)),
        rtol=1e-14,
    )
    np.testing.assert_allclose(
        bl(lane.P_col_absmax()), np.asarray(jax.vmap(lambda q: q.P_col_absmax())(qps)),
        rtol=1e-14,
    )


def test_scale_and_kkt_blocks_match(batches):
    qps, lane = batches
    D = jnp.asarray(np.exp(0.1 * RNG.normal(size=(B, lane.n))))
    E = jnp.asarray(np.exp(0.1 * RNG.normal(size=(B, lane.m))))
    c = jnp.asarray(np.exp(0.1 * RNG.normal(size=B)))
    rho = jnp.asarray(np.exp(RNG.normal(size=(B, lane.m))))
    sigma = 1e-6

    sc_ref = jax.vmap(lambda q, d, e, cc: q.scale_data(d, e, cc))(qps, D, E, c)
    sc_lane = lane.scale_data(
        jnp.moveaxis(D, 0, -1), jnp.moveaxis(E, 0, -1), c
    )
    d_ref, l_ref = jax.vmap(lambda q, r: q.kkt_blocks(r, sigma))(sc_ref, rho)
    d_lane, l_lane = sc_lane.kkt_blocks(jnp.moveaxis(rho, 0, -1), sigma)
    np.testing.assert_allclose(bl(d_lane), np.asarray(d_ref), rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(bl(l_lane), np.asarray(l_ref), rtol=1e-10, atol=1e-10)


def test_kkt_factor_solve_match(batches):
    qps, lane = batches
    rho = jnp.asarray(np.exp(RNG.normal(size=(B, lane.m))))
    sigma = 1e-6
    rhs = jnp.asarray(RNG.normal(size=(B, lane.n)))
    f_ref = jax.vmap(lambda q, r: q.kkt_factor(r, sigma))(qps, rho)
    x_ref = jax.vmap(lambda q, f, b: q.kkt_solve(f, b))(qps, f_ref, rhs)
    f_lane = lane.kkt_factor(jnp.moveaxis(rho, 0, -1), sigma)
    x_lane = lane.kkt_solve(f_lane, jnp.moveaxis(rhs, 0, -1))
    np.testing.assert_allclose(bl(x_lane), np.asarray(x_ref), rtol=1e-9, atol=1e-9)


def test_ruiz_match(batches):
    qps, lane = batches
    sc_ref, s_ref = jax.vmap(lambda q: ruiz_equilibrate(q, 10))(qps)
    sc_lane, s_lane = ruiz_equilibrate_lane(lane, 10)
    np.testing.assert_allclose(bl(s_lane.D), np.asarray(s_ref.D), rtol=1e-12)
    np.testing.assert_allclose(bl(s_lane.E), np.asarray(s_ref.E), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s_lane.c), np.asarray(s_ref.c), rtol=1e-12)
    np.testing.assert_allclose(
        bl(sc_lane.l), np.asarray(jax.vmap(lambda q: q.l)(sc_ref)),
        rtol=1e-12, atol=1e-14,
    )
    np.testing.assert_allclose(
        bl(sc_lane.q), np.asarray(jax.vmap(lambda q: q.q)(sc_ref)),
        rtol=1e-12, atol=1e-14,
    )


@pytest.mark.parametrize("honest", [True, False])
def test_solve_parity(honest):
    qps = build_batch(honest=honest)
    lane_res = solve_batched_lane(qps)
    ref_res = admm.solve_batched(qps)
    np.testing.assert_array_equal(
        np.asarray(lane_res.status), np.asarray(ref_res.status)
    )
    assert np.all(np.asarray(ref_res.status) == ExitCode.kOptimal)
    np.testing.assert_array_equal(
        np.asarray(lane_res.iterations), np.asarray(ref_res.iterations)
    )
    np.testing.assert_allclose(
        np.asarray(lane_res.x), np.asarray(ref_res.x), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(lane_res.obj_val), np.asarray(ref_res.obj_val), rtol=1e-6
    )


def test_solve_parity_infeasible():
    """A line obstacle the fake kinematics cannot bypass: both drivers must
    agree on the non-optimal statuses too."""
    qps = build_batch(honest=True, tight_obstacle=True)
    lane_res = solve_batched_lane(qps)
    ref_res = admm.solve_batched(qps)
    np.testing.assert_array_equal(
        np.asarray(lane_res.status), np.asarray(ref_res.status)
    )
    assert np.all(np.asarray(ref_res.status) != ExitCode.kOptimal)
    np.testing.assert_array_equal(
        np.asarray(lane_res.iterations), np.asarray(ref_res.iterations)
    )


def test_solve_parity_warm_start():
    qps = build_batch(honest=True)
    warm = jax.vmap(
        lambda i: calc_warm_start_jnp(
            0.02 * jnp.sin(jnp.arange(N, dtype=jnp.float64) + i),
            1.0 + 0.02 * jnp.cos(jnp.arange(N, dtype=jnp.float64) * 1.3 + i),
            W,
        )
    )(jnp.arange(B, dtype=jnp.float64))
    lane_res = solve_batched_lane(qps, warm_x=warm)
    ref_res = admm.solve_batched(qps, warm_x=warm)
    np.testing.assert_array_equal(
        np.asarray(lane_res.status), np.asarray(ref_res.status)
    )
    np.testing.assert_allclose(
        np.asarray(lane_res.x), np.asarray(ref_res.x), rtol=1e-6, atol=1e-6
    )


def test_solve_parity_no_polish_no_scaling():
    qps = build_batch(honest=False)
    settings = dataclasses.replace(admm.Settings(), polish=False, scaling=0)
    lane_res = solve_batched_lane(qps, settings)
    ref_res = admm.solve_batched(qps, settings)
    np.testing.assert_array_equal(
        np.asarray(lane_res.status), np.asarray(ref_res.status)
    )
    np.testing.assert_allclose(
        np.asarray(lane_res.x), np.asarray(ref_res.x), rtol=1e-6, atol=1e-6
    )


def test_from_trailing_matches_to_lane():
    """vmap(out_axes=-1) + from_trailing builds the identical lane container
    as batch-leading build + to_lane, with zero relayout."""
    from osqp_solver_tpu.gomp.trajectory_qp_lane import from_trailing

    balls = make_balls()
    obstacles = [HorizontalLine.create((0.0, 1.0), (100.0, 100.0, 0.15))]
    con3d = (jnp.full(3, -50.0), jnp.full(3, 50.0))
    pos = (jnp.full(N, -10.0), jnp.full(N, 10.0))
    vel = (jnp.full(N, -1.0), jnp.full(N, 1.0))
    acc = (jnp.full(N, -2.0), jnp.full(N, 2.0))
    base = empty_trajectory_qp(W, N, gripper_flags=(False, True), n_obstacles=1)

    def one(i):
        start = 0.02 * jnp.sin(jnp.arange(N, dtype=jnp.float64) + i)
        end = 1.0 + 0.02 * jnp.cos(jnp.arange(N, dtype=jnp.float64) * 1.3 + i)
        qp = with_gomp_boxes(base, start, end, pos, vel, acc)
        warm = calc_warm_start_jnp(start, end, W)
        return linearize_workspace(qp, balls, obstacles, con3d, warm)

    idx = jnp.arange(B, dtype=jnp.float64)
    lane_t = from_trailing(jax.vmap(one, out_axes=-1)(idx))
    lane_m = to_lane(jax.vmap(one)(idx))
    for la, lb in zip(jax.tree.leaves(lane_t), jax.tree.leaves(lane_m)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_jit_solve_lane():
    qps = build_batch(honest=True)
    lane_res = jax.jit(lambda q: solve_batched_lane(q))(qps)
    assert np.all(np.asarray(lane_res.status) == ExitCode.kOptimal)


# ---------------------------------------------------------------------------
# Waypoint-major row layout (the fused-chunk kernel's streaming layout)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("honest", [True, False])
def test_waypoint_layout_roundtrip_and_operators(honest):
    qps = build_batch(honest=honest)
    lane = to_lane(qps)
    wp = lane.replace(row_layout="waypoint")

    # concat/split round-trips through the padded layout.
    for name, pad in (("l", None), ("u", None)):
        got = getattr(wp, name)
        assert got.shape[0] == wp.m
        back = wp._split_rows(got)
        ref = lane._split_rows(getattr(lane, name))
        for a, b in zip(back, ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # A_matvec in waypoint layout = repacked type-layout A_matvec.
    x = jnp.asarray(RNG.normal(size=(lane.n, B)))
    got = wp.A_matvec(x)
    ref = lane.A_matvec(x)
    np.testing.assert_allclose(
        np.asarray(wp._concat_rows(*lane._split_rows(ref))), np.asarray(got),
        rtol=1e-12, atol=1e-12,
    )

    # AT_matvec consumes the packed layout (padding rows inert).
    yv = jnp.asarray(RNG.normal(size=(lane.m, B)))
    yp = wp._concat_rows(*lane._split_rows(yv))
    np.testing.assert_allclose(
        np.asarray(wp.AT_matvec(yp)), np.asarray(lane.AT_matvec(yv)),
        rtol=1e-12, atol=1e-12,
    )

    # Row norms repack consistently.
    np.testing.assert_array_equal(
        np.asarray(wp.A_row_absmax()),
        np.asarray(wp._concat_rows(*lane._split_rows(lane.A_row_absmax()))),
    )


@pytest.mark.parametrize("honest", [True, False])
def test_waypoint_layout_solve_parity(honest):
    qps = build_batch(honest=honest)
    lane = to_lane(qps)
    wp = lane.replace(row_layout="waypoint")
    ref = solve_batched_lane(lane)
    got = solve_batched_lane(wp)
    np.testing.assert_array_equal(np.asarray(got.status), np.asarray(ref.status))
    np.testing.assert_array_equal(
        np.asarray(got.iterations), np.asarray(ref.iterations)
    )
    np.testing.assert_allclose(
        np.asarray(got.x), np.asarray(ref.x), rtol=1e-6, atol=1e-6
    )
    # Dual solution parity through the layout map.
    y_ref = jnp.moveaxis(jnp.asarray(ref.y), 0, -1)
    y_got = jnp.moveaxis(jnp.asarray(got.y), 0, -1)
    for a, b in zip(wp._split_rows(y_got), lane._split_rows(y_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_rho0_traced_matches_static_rho():
    """solve_batched_lane(rho0=v) (traced, sweep-without-recompile) must
    match settings.rho=v (static) exactly — same initial rho_bar path."""
    qps = build_batch(honest=True)
    lane = to_lane(qps)
    s_static = dataclasses.replace(admm.Settings(), rho=0.27)
    ref = solve_batched_lane(lane, s_static)
    got = jax.jit(
        lambda qp, r0: solve_batched_lane(qp, admm.Settings(), rho0=r0)
    )(lane, jnp.asarray(0.27, lane.q.dtype))
    np.testing.assert_array_equal(np.asarray(got.status), np.asarray(ref.status))
    np.testing.assert_array_equal(
        np.asarray(got.iterations), np.asarray(ref.iterations)
    )
    np.testing.assert_allclose(
        np.asarray(got.x), np.asarray(ref.x), rtol=1e-10, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(got.rho), np.asarray(ref.rho), rtol=1e-10, atol=0
    )


@pytest.mark.parametrize("seed,factor_form", [(0, "gain"), (1, "hrec")])
def test_randomized_bounds_fused_parity(seed, factor_form):
    """Random per-problem bound perturbations (random tightenings, a few
    rows flipped to equalities or loosened to ±INF) — the fused lane solve
    must agree with the vmapped reference core on status and solution."""
    from osqp_solver_tpu.ops.admm import solve_batched

    rng = np.random.default_rng(seed)
    qps = build_batch(honest=True)
    dtype = qps.q_vec.dtype
    # Perturb velocity bounds per problem (keeps feasibility: the warm
    # straight line has |v| <= ~0.13 per step for these endpoints).
    scale = jnp.asarray(
        0.5 + 0.5 * rng.random((B, 1, 1)), dtype
    )
    vel_l = qps.vel_l * scale
    vel_u = qps.vel_u * scale
    # Loosen a random subset of position rows to one-sided constraints.
    loosen = jnp.asarray(rng.random((B, W, N)) < 0.2)
    pos_l = jnp.where(loosen, -1e30, qps.pos_l)
    qps = qps.replace(vel_l=vel_l, vel_u=vel_u, pos_l=pos_l)

    settings = dataclasses.replace(
        admm.Settings(), check_termination=5, fused_chunk="on",
        factor_form=factor_form,
    )
    got = solve_batched_lane(to_lane(qps), settings)
    ref = solve_batched(
        qps, dataclasses.replace(settings, fused_chunk="off")
    )
    np.testing.assert_array_equal(np.asarray(got.status), np.asarray(ref.status))
    assert np.all(np.asarray(got.status) == ExitCode.kOptimal)
    np.testing.assert_allclose(
        np.asarray(got.x), np.asarray(ref.x), rtol=1e-6, atol=1e-7
    )


@pytest.mark.parametrize("factor_form", ["gain", "hrec"])
def test_infeasible_detected_through_fused_emit_path(factor_form):
    """End-to-end: the fused chunk kernel's in-pass certificate reductions
    must drive the same non-optimal statuses as the unfused path."""
    qps = build_batch(honest=True, tight_obstacle=True)
    settings = dataclasses.replace(
        admm.Settings(), check_termination=5, fused_chunk="on",
        factor_form=factor_form,
    )
    got = solve_batched_lane(to_lane(qps), settings)
    ref = solve_batched_lane(
        to_lane(qps), dataclasses.replace(settings, fused_chunk="off")
    )
    np.testing.assert_array_equal(np.asarray(got.status), np.asarray(ref.status))
    np.testing.assert_array_equal(
        np.asarray(got.iterations), np.asarray(ref.iterations)
    )
    assert np.all(np.asarray(ref.status) != ExitCode.kOptimal)


@pytest.mark.parametrize("fused", [False, True])
def test_anderson_accelerated_solve_is_valid(fused):
    """Safeguarded Anderson acceleration (Settings.anderson > 0) must reach
    kOptimal through the same residual-based termination — an accepted
    solution is optimal-to-tolerance by construction — and stay close to
    the plain solve.  Covers the flat and the fused (packed-state) chunk
    paths, including consistent z/y recovery from the extrapolated w."""
    qps = build_batch(honest=True)
    base = dataclasses.replace(
        admm.Settings(), check_termination=3,
        fused_chunk="on" if fused else "off",
    )
    plain = solve_batched_lane(to_lane(qps), base)
    acc = solve_batched_lane(
        to_lane(qps), dataclasses.replace(base, anderson=4)
    )
    assert np.all(np.asarray(plain.status) == ExitCode.kOptimal)
    assert np.all(np.asarray(acc.status) == ExitCode.kOptimal)
    # Both satisfy the same KKT tolerances; they agree to tolerance scale.
    np.testing.assert_allclose(
        np.asarray(acc.x), np.asarray(plain.x), atol=5e-3, rtol=0
    )
    # The safeguard bounds any slowdown from rejected extrapolations.
    assert int(np.max(np.asarray(acc.iterations))) <= (
        int(np.max(np.asarray(plain.iterations))) + 6 * base.check_termination
    )


def test_anderson_with_rho_adaptation_resets():
    """ρ adaptation re-scales w = z + y/ρ — AA history must reset for the
    adapted problems (mixing incompatible scales in the extrapolation
    would diverge).  Start far from the tuned ρ so adaptation fires."""
    qps = build_batch(honest=True)
    s = dataclasses.replace(
        admm.Settings(), check_termination=3, adaptive_rho=True,
        adaptive_rho_interval=6, rho=10.0, anderson=4,
    )
    res = solve_batched_lane(to_lane(qps), s)
    assert np.all(np.asarray(res.status) == ExitCode.kOptimal)


# ---------------------------------------------------------------------------
# Anderson safeguard MECHANISM (VERDICT r3 weak #6: pin the reset paths
# directly, not just end-to-end statuses — ρ adaptation and diverging
# extrapolations are the paths most likely to rot silently).
# ---------------------------------------------------------------------------


def _aa_fixture(mh=3):
    """A legit (scaled, state-with-AA-carry, settings) triple on the lane
    containers, with a CONSISTENT iterate (z = Π(w), y = ρ(w − z)) so the
    plain iterate survives _anderson_step's z/y recovery bit-for-bit."""
    from osqp_solver_tpu.ops.admm_lane import ruiz_equilibrate_lane

    qps = build_batch(honest=False)
    lane = to_lane(qps)
    settings = dataclasses.replace(admm.Settings(), anderson=mh)
    scaled, scaling = ruiz_equilibrate_lane(lane)
    st = init_state_lane(scaled, settings, scaling=scaling)
    n, B = scaled.q.shape
    m = scaled.l.shape[0]
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(n, B)))
    w = jnp.asarray(rng.normal(size=(m, B)))
    z = jnp.clip(w, scaled.l, scaled.u)
    y = st.rho_vec * (w - z)
    st = st.replace(x=x, z=z, y=y)
    v_out = jnp.concatenate([x, z + y / st.rho_vec], axis=0)
    st = st.replace(
        aa_g=jnp.zeros((mh,) + v_out.shape, v_out.dtype),
        aa_f=jnp.zeros((mh,) + v_out.shape, v_out.dtype),
        aa_vin=v_out,  # chunk input == output ⇒ f = 0 (no growth trigger)
        aa_n=jnp.zeros((B,), jnp.int32),
        aa_fnorm=jnp.full((B,), jnp.inf, v_out.dtype),
    )
    return scaled, st, settings, v_out


def _prime_history(st, v_out, rng_seed=5):
    """Two distinct genuine history slots + counters as if two accepted
    extrapolation steps already happened."""
    rng = np.random.default_rng(rng_seed)
    aa_g = st.aa_g
    aa_f = st.aa_f
    for s in range(2):
        g = v_out + jnp.asarray(rng.normal(size=v_out.shape)) * 0.1
        f = jnp.asarray(rng.normal(size=v_out.shape)) * 0.05
        aa_g = aa_g.at[s].set(g)
        aa_f = aa_f.at[s].set(f)
    B = st.aa_n.shape[0]
    return st.replace(
        aa_g=aa_g, aa_f=aa_f,
        aa_n=jnp.full((B,), 2, jnp.int32),
        aa_fnorm=jnp.full((B,), 1.0, v_out.dtype),
    )


@quick
def test_factor_round_f16_still_converges():
    """Settings.factor_round="f16" (full-solve reduced-precision factor
    SIMULATION — benchmarks/factor_round_sweep.py is the measurement):
    termination evaluates TRUE residuals against the rounded-factor
    iterates, so accepted solutions remain optimal-to-tolerance; only the
    iteration count may grow."""
    qps = build_batch(honest=True)
    base = dataclasses.replace(admm.Settings(), check_termination=3)
    plain = solve_batched_lane(to_lane(qps), base)
    f16 = solve_batched_lane(
        to_lane(qps), dataclasses.replace(base, factor_round="f16")
    )
    assert np.all(np.asarray(plain.status) == ExitCode.kOptimal)
    assert np.all(np.asarray(f16.status) == ExitCode.kOptimal)
    np.testing.assert_allclose(
        np.asarray(f16.x), np.asarray(plain.x), atol=5e-3
    )


@quick
def test_anderson_rho_adaptation_reset_mechanism():
    """reset_mask=True (the ρ-adaptation path): history is wiped — every
    slot refilled with the current pair, counter back to 1, and the
    degenerate LS reproduces the PLAIN iterate exactly (no stale-scale
    mixing)."""
    from osqp_solver_tpu.ops.admm_lane import _anderson_step

    scaled, st, settings, v_out = _aa_fixture()
    st = _prime_history(st, v_out)
    # Small drift: fnorm tiny, well under safeguard × aa_fnorm=1.0 — only
    # the reset_mask forces the reset.
    out = _anderson_step(
        scaled, st, settings, use_fused=False,
        reset_mask=jnp.ones_like(st.done),
    )
    np.testing.assert_array_equal(np.asarray(out.aa_n), 1)
    for s in range(settings.anderson):
        np.testing.assert_allclose(np.asarray(out.aa_g[s]), np.asarray(v_out))
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(st.x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.z), np.asarray(st.z), atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.y), np.asarray(st.y), atol=1e-12)


@quick
def test_anderson_divergence_safeguard_reset_mechanism():
    """A chunk residual that GREW past safeguard × previous must be
    rejected: history reset (counter 1, slots = current pair) and the plain
    iterate kept — the acceleration can never make a diverging problem
    worse than plain ADMM."""
    from osqp_solver_tpu.ops.admm_lane import _anderson_step

    scaled, st, settings, v_out = _aa_fixture()
    st = _prime_history(st, v_out)
    # Make the chunk residual f = v_out − aa_vin large vs aa_fnorm=1.0.
    st = st.replace(aa_vin=st.aa_vin - 10.0)
    out = _anderson_step(
        scaled, st, settings, use_fused=False,
        reset_mask=jnp.zeros_like(st.done),
    )
    np.testing.assert_array_equal(np.asarray(out.aa_n), 1)
    for s in range(settings.anderson):
        np.testing.assert_allclose(np.asarray(out.aa_g[s]), np.asarray(v_out))
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(st.x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.z), np.asarray(st.z), atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.y), np.asarray(st.y), atol=1e-12)


@quick
def test_anderson_accept_extrapolates_consistently():
    """The accept path: with genuine history and a small residual the step
    EXTRAPOLATES (iterate moves, counter grows) and the new (z, y) are
    recovered consistently from w — z = Π_[l,u](w), y = ρ(w − z) — so the
    next termination check sees true KKT residuals."""
    from osqp_solver_tpu.ops.admm_lane import _anderson_step

    scaled, st, settings, v_out = _aa_fixture()
    st = _prime_history(st, v_out)
    # Small but NONZERO residual (keeps M well-posed, no growth trigger).
    st = st.replace(aa_vin=st.aa_vin - 0.01)
    out = _anderson_step(
        scaled, st, settings, use_fused=False,
        reset_mask=jnp.zeros_like(st.done),
    )
    np.testing.assert_array_equal(np.asarray(out.aa_n), 3)
    assert float(jnp.max(jnp.abs(out.x - st.x))) > 1e-9  # it moved
    n = scaled.q.shape[0]
    w = out.z + out.y / out.rho_vec
    np.testing.assert_allclose(
        np.asarray(out.z), np.asarray(jnp.clip(w, scaled.l, scaled.u)),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(out.y), np.asarray(out.rho_vec * (w - out.z)), atol=1e-12
    )


@quick
def test_anderson_done_problems_frozen():
    """Converged problems are untouched by the Anderson step: iterate,
    history counter, and safeguard norm all frozen."""
    from osqp_solver_tpu.ops.admm_lane import _anderson_step

    scaled, st, settings, v_out = _aa_fixture()
    st = _prime_history(st, v_out)
    done = jnp.zeros_like(st.done).at[1].set(True)
    st = st.replace(done=done, aa_vin=st.aa_vin - 0.01)
    out = _anderson_step(
        scaled, st, settings, use_fused=False,
        reset_mask=jnp.zeros_like(st.done),
    )
    np.testing.assert_allclose(
        np.asarray(out.x[:, 1]), np.asarray(st.x[:, 1]), atol=1e-15)
    np.testing.assert_allclose(
        np.asarray(out.z[:, 1]), np.asarray(st.z[:, 1]), atol=1e-15)
    np.testing.assert_allclose(
        np.asarray(out.y[:, 1]), np.asarray(st.y[:, 1]), atol=1e-15)
    assert int(out.aa_n[1]) == int(st.aa_n[1])
    assert float(out.aa_fnorm[1]) == float(st.aa_fnorm[1])
    # the live problems did move
    assert float(jnp.max(jnp.abs(out.x[:, 0] - st.x[:, 0]))) > 1e-9
