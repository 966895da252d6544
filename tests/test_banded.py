"""Banded row-block QP container + separator-only horizon-sharded ADMM.

VERDICT r1 next #3: the horizon-sharded solve must exchange only O(K·B)
separator data per iteration (no full-interior all_gather).  These tests pin

* operator parity between :class:`BandedQP` and :class:`TrajectoryQP`,
* solve parity (single-device banded vs structured container),
* sharded-vs-single solve parity on 2- and 8-device CPU meshes,
* the communication payload shape (every all-gather in the compiled program
  is separator-sized).
"""
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osqp_solver_tpu.gomp.trajectory_qp import (
    empty_trajectory_qp,
    linearize_workspace,
    with_gomp_boxes,
)
from osqp_solver_tpu.models.robot import RobotBall
from osqp_solver_tpu.ops import admm
from osqp_solver_tpu.ops.status import ExitCode
from osqp_solver_tpu.parallel.banded import (
    BandedQP,
    banded_from_trajectory,
    deinterleave_state,
    interleave_state,
    solve_banded_sharded,
)
from osqp_solver_tpu.parallel.mesh import HORIZON_AXIS, make_mesh


def make_traj_qp(W=25, N=3):
    qp = empty_trajectory_qp(W, N, gripper_flags=(True,), n_obstacles=0)
    qp = with_gomp_boxes(
        qp,
        jnp.zeros(N),
        jnp.ones(N),
        (jnp.full(N, -5.0), jnp.full(N, 5.0)),
        (jnp.full(N, -0.2), jnp.full(N, 0.2)),
        (jnp.full(N, -0.5), jnp.full(N, 0.5)),
    )
    ball = RobotBall(
        fk=lambda s: jnp.array([s[0], s[1], s[0] + s[2]]),
        jacobian=lambda s: jnp.array(
            [[1.0, 0, 0], [0, 1.0, 0], [1.0, 0, 1.0]]
        ),
        radius=0.05,
        is_gripper=True,
    )
    warm = jnp.concatenate(
        [jnp.linspace(0.0, 1.0, W)[:, None].repeat(N, 1).reshape(-1),
         jnp.zeros(W * N)]
    )
    con3d = (jnp.full(3, -4.0), jnp.full(3, 4.0))
    return linearize_workspace(qp, [ball], [], con3d, warm)


def test_banded_operator_parity():
    qp = make_traj_qp()
    banded, row_map = banded_from_trajectory(qp)
    W, N = qp.waypoints, qp.n_dim
    x_ref = jax.random.normal(jax.random.PRNGKey(0), (2 * W * N,))
    x_int = interleave_state(x_ref, W, N)

    # A matvec parity through the row map
    z_t = np.asarray(qp.A_matvec(x_ref))
    z_b = np.asarray(banded.A_matvec(x_int))
    np.testing.assert_allclose(z_b[row_map], z_t, atol=1e-12)
    # bounds parity (+ unmapped rows inert)
    np.testing.assert_allclose(np.asarray(banded.l)[row_map], np.asarray(qp.l))
    np.testing.assert_allclose(np.asarray(banded.u)[row_map], np.asarray(qp.u))
    inert = np.setdiff1d(np.arange(banded.m), row_map)
    assert np.all(np.asarray(banded.l)[inert] <= -1e29)
    assert np.all(np.asarray(banded.u)[inert] >= 1e29)
    assert np.allclose(
        np.abs(np.asarray(banded.A0).reshape(banded.m, -1)[inert]), 0.0
    )

    # AT matvec parity: scatter a compact y into banded rows
    y_t = jax.random.normal(jax.random.PRNGKey(1), (qp.m,))
    y_b = jnp.zeros(banded.m).at[row_map].set(y_t)
    out_t = np.asarray(qp.AT_matvec(y_t))
    out_b = np.asarray(deinterleave_state(banded.AT_matvec(y_b), W, N))
    np.testing.assert_allclose(out_b, out_t, atol=1e-12)

    # P matvec parity
    p_t = np.asarray(qp.P_matvec(x_ref))
    p_b = np.asarray(deinterleave_state(banded.P_matvec(x_int), W, N))
    np.testing.assert_allclose(p_b, p_t, atol=1e-12)


def test_banded_solve_matches_trajectory():
    qp = make_traj_qp()
    banded, _ = banded_from_trajectory(qp)
    W, N = qp.waypoints, qp.n_dim
    res_t = admm.solve(qp)
    res_b = admm.solve(banded)
    assert int(res_t.status) == ExitCode.kOptimal
    assert int(res_b.status) == ExitCode.kOptimal
    x_b = deinterleave_state(res_b.x, W, N)
    np.testing.assert_allclose(np.asarray(x_b), np.asarray(res_t.x), atol=2e-3)
    np.testing.assert_allclose(
        float(res_b.obj_val), float(res_t.obj_val), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("K", [2, 8])
def test_sharded_solve_matches_single(K):
    qp = make_traj_qp()
    banded, _ = banded_from_trajectory(qp)
    mesh = make_mesh(batch=1, horizon=K)
    res_single = admm.solve(banded)
    res_shard = solve_banded_sharded(banded, mesh)
    assert int(res_shard.status) == ExitCode.kOptimal
    np.testing.assert_allclose(
        np.asarray(res_shard.x), np.asarray(res_single.x), atol=2e-3
    )
    np.testing.assert_allclose(
        float(res_shard.obj_val), float(res_single.obj_val),
        atol=1e-5, rtol=1e-5,
    )
    # duals and slacks agree on the real rows
    np.testing.assert_allclose(
        np.asarray(res_shard.z), np.asarray(res_single.z), atol=2e-3
    )


def _collective_payloads(W, N, K):
    """Compile the sharded solve at horizon W and return the sorted list of
    (op, element-count) for every cross-device collective in the HLO."""
    from jax.sharding import PartitionSpec as P

    from osqp_solver_tpu.parallel import banded as banded_mod

    qp = make_traj_qp(W=W, N=N)
    banded, _ = banded_from_trajectory(qp)
    mesh = make_mesh(batch=1, horizon=K)
    chunks, Ws = banded_mod.partition_banded(banded, K)
    B, r = banded.block, banded.rows_per_wp
    warm = jnp.zeros((K, Ws * B))

    def device_fn(leaves, w):
        local = {k: v[0] for k, v in leaves.items()}
        sq = banded_mod.ShardedBandedQP(
            waypoints=Ws, block=B, rows_per_wp=r,
            n_chunks=K, total_waypoints=W, axis=HORIZON_AXIS, **local,
        )
        res = admm.solve(sq, admm.Settings(), warm_x=w[0])
        return res.x[None]

    fn = jax.jit(
        jax.shard_map(
            device_fn, mesh=mesh,
            in_specs=({k: P(HORIZON_AXIS) for k in chunks}, P(HORIZON_AXIS)),
            out_specs=P(HORIZON_AXIS), check_vma=False,
        )
    )
    hlo = fn.lower(chunks, warm).compile().as_text()
    out = []
    for op in ("all-gather", "collective-permute"):
        for dims in re.findall(
            rf"= f\d+\[([\d,]*)\]\{{[^}}]*\}} {op}\(", hlo
        ):
            size = int(np.prod([int(d) for d in dims.split(",") if d])) if dims else 1
            out.append((op, size))
    return sorted(out), B


def test_sharded_communication_is_separator_only():
    """Every cross-device collective payload is separator-sized — O(K·B²) at
    worst (Schur factor blocks), O(B) halos — and, critically, INDEPENDENT of
    the horizon length (the r1 implementation all-gathered the (K, Wl, B)
    interior, which scales with W)."""
    K = 8
    short, B = _collective_payloads(33, 3, K)
    long_, _ = _collective_payloads(65, 3, K)  # 2x the horizon
    assert short, "expected collectives in the compiled sharded solve"
    # Identical payload multiset at 2x horizon ⇒ nothing scales with W.
    assert short == long_, (short, long_)
    assert max(s for _, s in short) <= K * B * B


def test_sharded_infeasible_certificate():
    """A primal-infeasible trajectory QP (contradictory equality rows) gets
    the certificate through the sharded path too."""
    W, N = 9, 2
    qp = empty_trajectory_qp(W, N)
    qp = with_gomp_boxes(
        qp,
        jnp.zeros(N),
        jnp.ones(N),
        (jnp.full(N, -0.01), jnp.full(N, 0.01)),  # pos box excludes end=1
        (jnp.full(N, -5.0), jnp.full(N, 5.0)),
        (jnp.full(N, -5.0), jnp.full(N, 5.0)),
    )
    banded, _ = banded_from_trajectory(qp)
    res_single = admm.solve(banded)
    mesh = make_mesh(batch=1, horizon=2)
    res_shard = solve_banded_sharded(banded, mesh)
    assert int(res_single.status) == ExitCode.kPrimalInfeasible
    assert int(res_shard.status) == ExitCode.kPrimalInfeasible


def test_2d_mesh_batch_by_horizon():
    """Full 2-D (batch, horizon) mesh (SURVEY.md §2.3): 4 independent
    problems over 2 batch rows (2 vmapped per row) × 4-way horizon sharding
    on the 8-device mesh; each problem matches its own single-device solve
    (identical statuses/iterations — the collective-aware termination makes
    identical decisions; the vmapped while-loop masks finished problems)."""
    from osqp_solver_tpu.parallel.banded import solve_banded_sharded_2d

    bandeds = []
    for i in range(4):
        qp_i = make_traj_qp(W=19, N=3)
        qp_i = qp_i.replace(pos_l=qp_i.pos_l.at[-1].add(0.02 * i),
                            pos_u=qp_i.pos_u.at[-1].add(0.02 * i))
        bandeds.append(banded_from_trajectory(qp_i)[0])
    qps = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *bandeds)

    mesh = make_mesh(batch=2, horizon=4)
    res = solve_banded_sharded_2d(qps, mesh)
    for i, banded in enumerate(bandeds):
        ref = admm.solve(banded)
        assert int(np.asarray(res.status)[i]) == int(ref.status) == 0
        assert int(np.asarray(res.iterations)[i]) == int(ref.iterations)
        np.testing.assert_allclose(
            np.asarray(res.x)[i], np.asarray(ref.x), rtol=0, atol=2e-3
        )


def test_two_level_local_chunks_parity():
    """Two-level decomposition (device shards × local Schur chunks of each
    interior) is numerically equivalent to the scan-interior path: identical
    termination decisions, solutions in the same tolerance class."""
    qp = make_traj_qp(W=41, N=3)
    banded, _ = banded_from_trajectory(qp)
    mesh = make_mesh(batch=1, horizon=2)
    res_scan = solve_banded_sharded(banded, mesh)
    res_two = solve_banded_sharded(banded, mesh, local_chunks=4)
    assert int(res_scan.status) == int(res_two.status) == 0
    assert int(res_scan.iterations) == int(res_two.iterations)
    np.testing.assert_allclose(
        np.asarray(res_two.x), np.asarray(res_scan.x), rtol=0, atol=2e-3
    )
