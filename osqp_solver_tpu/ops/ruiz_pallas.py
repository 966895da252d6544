"""Pallas Ruiz equilibration: all scaling iterations in one program.

OSQP's modified Ruiz (``scaling.c`` semantics — see
:mod:`osqp_solver_tpu.ops.ruiz`) is mathematically a per-waypoint stencil:
every row touches variables of waypoints (t, t+1), every column gathers
rows of waypoints (t−1, t), and the block-tridiagonal P contributes to
columns of (t−1, t, t+1).  Composed from XLA ops the 10 iterations cost
~250 kernel launches (~40 ms at batch 1024 on the tunneled v5e — a third
of the whole solve); here each iteration is one streaming pass over the
horizon inside a single kernel, with 4-slot buffering so waypoints t, t−1,
t−2 are simultaneously resident while t+1 prefetches (all halos the norms
need), and per-problem accumulators (cost-normalization mean/max, the
running c) as loop carries.

Values are elementwise-identical to the reference formulation: |a·e·d| =
|a|·e·d for positive scalings, and every product keeps the same grouping
as ``LaneTrajectoryQP.scale_data``.  The full scaled container is still
materialized exactly once, in XLA, after the kernel returns (D, E, c).

Requires the waypoint-major row layout (E streams as contiguous (R, B)
tiles).  Reference anchor: OSQP ``scaling.c`` (the reference leaves
``settings.scaling`` at its default 10, ``osqp-wrapper.h:26-27``).
Parity: ``tests/test_ruiz_pallas.py`` pins the kernel against the jnp
lane Ruiz (itself pinned against the vmapped reference implementation).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ruiz import MAX_SCALING, MIN_SCALING, Scaling

LANE = 128
MAX_SUBLANES = 8
NSLOT = 4  # t+1 prefetching while t, t−1, t−2 stay resident


def ruiz_kernel_supported(qp) -> bool:
    B = qp.batch
    if B % LANE:
        return False
    GS = B // LANE
    S = min(MAX_SUBLANES, GS)
    return (
        qp.row_layout == "waypoint" and GS % S == 0 and qp.waypoints >= 4
    )


def _limit_t(x):
    """OSQP limit_scaling on a tile."""
    x = jnp.where(x < MIN_SCALING, 1.0, x)
    return jnp.minimum(x, MAX_SCALING)


def _make_kernel(*, W, N, Rp, CRp, S, iters, row_off, coef_off, ball_rows,
                 ball_coefs, n_obstacles, p_structure):
    B2 = 2 * N
    vel_diag = p_structure == "vel_diag"
    NG = N if vel_diag else B2  # gamma carry width

    def kernel(
        ac_hbm, aPd_hbm, aPl_hbm, aq_hbm, c_in_vmem, D_in, E_in,
        D_hbm, E_hbm, c_out_vmem,  # D/E outputs alias D_in/E_in
        acb, pdb, plb, aqb, Db, Eb, dob, eob,
        acs, pds, pls, aqs, Ds, Es, dos, eos,
    ):
        del D_in, E_in  # same memory as D_hbm/E_hbm
        sub0 = pl.program_id(0) * S
        zero = jnp.zeros((S, LANE), Db.dtype)

        def rdma(hbm, buf, sem, slot, t):
            idx = (t,) + (slice(None),) * (len(hbm.shape) - 3) + (
                pl.ds(sub0, S), slice(None),
            )
            return pltpu.make_async_copy(hbm.at[idx], buf.at[slot], sem.at[slot])

        def wdma(buf, hbm, sem, slot, t):
            idx = (t,) + (slice(None),) * (len(hbm.shape) - 3) + (
                pl.ds(sub0, S), slice(None),
            )
            return pltpu.make_async_copy(buf.at[slot], hbm.at[idx], sem.at[slot])

        streams = (
            (ac_hbm, acb, acs), (aPd_hbm, pdb, pds), (aPl_hbm, plb, pls),
            (aq_hbm, aqb, aqs), (D_hbm, Db, Ds), (E_hbm, Eb, Es),
        )

        def start(slot, t):
            for hbm, buf, sem in streams:
                rdma(hbm, buf, sem, slot, t).start()

        def wait(slot, t):
            for hbm, buf, sem in streams:
                rdma(hbm, buf, sem, slot, t).wait()

        def one_pass(it, c):
            start(0, 0)

            def body(t, carry):
                c, gsum, gqmax, Dn_prev, gpart = carry
                u = t - 1  # emission waypoint
                s_u = (t - 1) % NSLOT
                s_t = t % NSLOT
                s_p = (t - 2) % NSLOT  # waypoint u−1

                # Prefetch t+1 (slot holds t−3: no longer read).
                @pl.when(t + 1 < W)
                def _():
                    start((t + 1) % NSLOT, t + 1)

                @pl.when(t < W)
                def _():
                    wait(s_t, t)

                have_u = (t >= 1) & (t <= W)
                have_prev = t >= 2  # waypoint u−1 exists
                have_next = t <= W - 1  # waypoint u+1 exists

                def m(pred, v):
                    return jnp.where(pred, v, 0.0)

                # Scaled |coef| (grouping = scale_data: (|a|·e)·d).
                def srow(slot, cof, erow, dq):
                    return acb[slot, cof] * Eb[slot, erow] * dq

                def Dq(slot, j):
                    return Db[slot, j]

                def Dv(slot, j):
                    return Db[slot, N + j]

                # ---------- column maxima for waypoint u (A + P, old D/c)
                colq = [zero] * N
                colv = [zero] * N
                for j in range(N):
                    cq = srow(s_u, coef_off["pos"] + j,
                              row_off["pos"] + j, Dq(s_u, j))
                    cq = jnp.maximum(
                        cq, srow(s_u, coef_off["c2"] + j,
                                 row_off["dyn"] + j, Dq(s_u, j)))
                    cq = jnp.maximum(
                        cq, m(have_prev,
                              srow(s_p, coef_off["c1"] + j,
                                   row_off["dyn"] + j, Dq(s_u, j))))
                    for b in range(len(ball_rows)):
                        ws_r, obs_r = ball_rows[b]
                        ws_c, obs_c = ball_coefs[b]
                        if ws_r is not None:
                            for a3 in range(3):
                                cq = jnp.maximum(
                                    cq, srow(s_u, ws_c + a3 * N + j,
                                             ws_r + a3, Dq(s_u, j)))
                        if obs_r is not None:
                            for o in range(n_obstacles):
                                cq = jnp.maximum(
                                    cq, srow(s_u, obs_c + o * N + j,
                                             obs_r + o, Dq(s_u, j)))
                    colq[j] = cq

                    cv = srow(s_u, coef_off["vel"] + j,
                              row_off["vel"] + j, Dv(s_u, j))
                    cv = jnp.maximum(
                        cv, srow(s_u, coef_off["c0"] + j,
                                 row_off["dyn"] + j, Dv(s_u, j)))
                    cv = jnp.maximum(
                        cv, srow(s_u, coef_off["a1"] + j,
                                 row_off["acc"] + j, Dv(s_u, j)))
                    cv = jnp.maximum(
                        cv, m(have_prev,
                              srow(s_p, coef_off["a0"] + j,
                                   row_off["acc"] + j, Dv(s_u, j))))
                    colv[j] = cv

                # P columns: diag(u) + lower-row (aPl[u−1]) + lower-col
                # (aPl[u] with old D[u+1]).  "vel_diag": nonzeros only on
                # the velocity diagonal — q columns get no P contribution.
                if vel_diag:
                    for j in range(N):
                        pcol = ((c * Dv(s_u, j)) * pdb[s_u, j]) * Dv(s_u, j)
                        pcol = jnp.maximum(
                            pcol,
                            m(have_prev,
                              (plb[s_p, j] * Dv(s_p, j))
                              * (c * Dv(s_u, j))))
                        pcol = jnp.maximum(
                            pcol,
                            m(have_next,
                              ((c * Dv(s_t, j)) * plb[s_u, j])
                              * Dv(s_u, j)))
                        colv[j] = jnp.maximum(colv[j], pcol)
                else:
                    for jj in range(B2):
                        acc = zero
                        for ii in range(B2):
                            acc = jnp.maximum(
                                acc, (c * Db[s_u, ii]) * pdb[s_u, ii, jj])
                        pcol = acc * Db[s_u, jj]
                        accr = zero
                        for jx in range(B2):
                            accr = jnp.maximum(
                                accr, plb[s_p, jj, jx] * Db[s_p, jx])
                        pcol = jnp.maximum(
                            pcol, m(have_prev, accr * (c * Db[s_u, jj])))
                        accc = zero
                        for ii in range(B2):
                            accc = jnp.maximum(
                                accc, (c * Db[s_t, ii]) * plb[s_u, ii, jj])
                        pcol = jnp.maximum(
                            pcol, m(have_next, accc * Db[s_u, jj]))
                        if jj < N:
                            colq[jj] = jnp.maximum(colq[jj], pcol)
                        else:
                            colv[jj - N] = jnp.maximum(colv[jj - N], pcol)

                # ---------- row maxima of waypoint u (old D/E)
                rowmax = [zero] * Rp
                for j in range(N):
                    rd = jnp.maximum(
                        srow(s_u, coef_off["c0"] + j,
                             row_off["dyn"] + j, Dv(s_u, j)),
                        srow(s_u, coef_off["c2"] + j,
                             row_off["dyn"] + j, Dq(s_u, j)))
                    rd = jnp.maximum(
                        rd, m(have_next,
                              srow(s_u, coef_off["c1"] + j,
                                   row_off["dyn"] + j, Dq(s_t, j))))
                    rowmax[row_off["dyn"] + j] = rd
                    rowmax[row_off["pos"] + j] = srow(
                        s_u, coef_off["pos"] + j, row_off["pos"] + j,
                        Dq(s_u, j))
                    rowmax[row_off["vel"] + j] = srow(
                        s_u, coef_off["vel"] + j, row_off["vel"] + j,
                        Dv(s_u, j))
                    rowmax[row_off["acc"] + j] = jnp.maximum(
                        srow(s_u, coef_off["a1"] + j,
                             row_off["acc"] + j, Dv(s_u, j)),
                        m(have_next,
                          srow(s_u, coef_off["a0"] + j,
                               row_off["acc"] + j, Dv(s_t, j))))
                for b in range(len(ball_rows)):
                    ws_r, obs_r = ball_rows[b]
                    ws_c, obs_c = ball_coefs[b]
                    if ws_r is not None:
                        for a3 in range(3):
                            acc = zero
                            for j in range(N):
                                acc = jnp.maximum(
                                    acc, srow(s_u, ws_c + a3 * N + j,
                                              ws_r + a3, Dq(s_u, j)))
                            rowmax[ws_r + a3] = acc
                    if obs_r is not None:
                        for o in range(n_obstacles):
                            acc = zero
                            for j in range(N):
                                acc = jnp.maximum(
                                    acc, srow(s_u, obs_c + o * N + j,
                                              obs_r + o, Dq(s_u, j)))
                            rowmax[obs_r + o] = acc

                # ---------- new D / E for waypoint u, written back
                Dn = [zero] * B2
                for j in range(N):
                    Dn[j] = Db[s_u, j] * (
                        1.0 / jnp.sqrt(_limit_t(colq[j]))
                    )
                    Dn[N + j] = Db[s_u, N + j] * (
                        1.0 / jnp.sqrt(_limit_t(colv[j]))
                    )

                @pl.when(have_u)
                def _():
                    for j in range(B2):
                        dob[0, j] = Dn[j]
                    for r in range(Rp):
                        eob[0, r] = Eb[s_u, r] * (
                            1.0 / jnp.sqrt(_limit_t(rowmax[r]))
                        )
                    wd = wdma(dob, D_hbm, dos, 0, jnp.maximum(u, 0))
                    wd.start()
                    wd.wait()
                    we = wdma(eob, E_hbm, eos, 0, jnp.maximum(u, 0))
                    we.start()
                    we.wait()

                # ---------- cost-normalization (new D, old c) --------------
                # Finish waypoint u−1: its lowcol needs Dn_u (just computed).
                if vel_diag:
                    # q columns contribute _limit(0) = 1 each to the mean.
                    gsum_add = jnp.full((S, LANE), float(N), Db.dtype)
                    for j in range(N):
                        accc = (c * Dn[N + j]) * plb[s_p, j]
                        full = jnp.maximum(
                            gpart[j], m(t <= W, accc * Dn_prev[j]))
                        gsum_add = gsum_add + _limit_t(full)
                    gsum = gsum + jnp.where(have_prev, gsum_add, 0.0)

                    gpart_new = [zero] * NG
                    for j in range(N):
                        g = ((c * Dn[N + j]) * pdb[s_u, j]) * Dn[N + j]
                        accr = plb[s_p, j] * Dn_prev[j]
                        g = jnp.maximum(
                            g, m(have_prev, accr * (c * Dn[N + j])))
                        gpart_new[j] = g
                else:
                    gsum_add = zero
                    for jj in range(B2):
                        accc = zero
                        for ii in range(B2):
                            accc = jnp.maximum(
                                accc, (c * Dn[ii]) * plb[s_p, ii, jj])
                        full = jnp.maximum(
                            gpart[jj], m(t <= W, accc * Dn_prev[jj]))
                        gsum_add = gsum_add + _limit_t(full)
                    gsum = gsum + jnp.where(have_prev, gsum_add, 0.0)

                    # Partial (diag + lowrow) for u, finished next step.
                    gpart_new = [zero] * B2
                    for jj in range(B2):
                        acc = zero
                        for ii in range(B2):
                            acc = jnp.maximum(
                                acc, (c * Dn[ii]) * pdb[s_u, ii, jj])
                        g = acc * Dn[jj]
                        accr = zero
                        for jx in range(B2):
                            accr = jnp.maximum(
                                accr, plb[s_p, jj, jx] * Dn_prev[jx])
                        g = jnp.maximum(g, m(have_prev, accr * (c * Dn[jj])))
                        gpart_new[jj] = g

                qadd = zero
                for j in range(B2):
                    qadd = jnp.maximum(qadd, (c * Dn[j]) * aqb[s_u, j])
                gqmax = jnp.maximum(gqmax, jnp.where(have_u, qadd, 0.0))

                Dn_keep = Dn[N:] if vel_diag else Dn
                Dn_prev = tuple(
                    jnp.where(have_u, d, p) for d, p in zip(Dn_keep, Dn_prev)
                )
                gpart = tuple(
                    jnp.where(have_u, g, p) for g, p in zip(gpart_new, gpart)
                )
                return (c, gsum, gqmax, Dn_prev, gpart)

            zNG = tuple(zero for _ in range(NG))
            c, gsum, gqmax, _, _ = jax.lax.fori_loop(
                0, W + 2, body, (c, zero, zero, zNG, zNG)
            )
            gamma = 1.0 / _limit_t(
                jnp.maximum(gsum / float(W * B2), gqmax)
            )
            return c * gamma

        c = jax.lax.fori_loop(0, iters, one_pass, c_in_vmem[:])
        c_out_vmem[:] = c

    return kernel


# ---------------------------------------------------------------------------
# Host-side call
# ---------------------------------------------------------------------------


def ruiz_equilibrate_lane_kernel(qp, iters: int = 10, interpret=None):
    """Kernel-backed lane Ruiz: returns ``(scaled_qp, Scaling)`` like
    :func:`osqp_solver_tpu.ops.admm_lane.ruiz_equilibrate_lane`."""
    from ..gomp.trajectory_qp_lane import LaneTrajectoryQP  # noqa: F401
    from .admm_fused import _coef_layout, _row_layout, build_coef_pack

    W, N, B = qp.waypoints, qp.n_dim, qp.batch
    Rp = qp.rows_per_waypoint_padded
    B2 = 2 * N
    dt = qp.q_vec.dtype
    row_off, ball_rows = _row_layout(qp)
    coef_off, ball_coefs, _, CRp = _coef_layout(qp)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    GS = B // LANE
    S = min(MAX_SUBLANES, GS)
    grid = GS // S

    abs_fields = dict(
        dyn_coef=jnp.abs(qp.dyn_coef), pos_coef=jnp.abs(qp.pos_coef),
        vel_coef=jnp.abs(qp.vel_coef), acc_coef=jnp.abs(qp.acc_coef),
        ws_jac=jnp.abs(qp.ws_jac), obs_jac=jnp.abs(qp.obs_jac),
    )
    ac = build_coef_pack(qp.replace(**abs_fields))
    if qp.p_structure == "vel_diag":
        # Velocity-diagonal packs: |Pd_vv| and |Pl_vv| (W-padded), Np rows.
        Np = -(-N // 8) * 8
        ppd = jnp.stack(
            [jnp.abs(qp.P_diag[:, N + j, N + j]) for j in range(N)], axis=1
        )
        ppl = jnp.stack(
            [jnp.abs(qp.P_lower[:, N + j, N + j]) for j in range(N)], axis=1
        )
        ppl = jnp.concatenate([ppl, jnp.zeros((1, N, B), dt)], axis=0)
        if Np > N:
            padz = lambda a: jnp.concatenate(  # noqa: E731
                [a, jnp.zeros((W, Np - N, B), dt)], axis=1
            )
            ppd, ppl = padz(ppd), padz(ppl)
        aPd, aPl = ppd, ppl
        p_shapes = [(NSLOT, Np, S, LANE), (NSLOT, Np, S, LANE)]
    else:
        aPd = jnp.abs(qp.P_diag)
        aPl = jnp.concatenate(
            [jnp.abs(qp.P_lower), jnp.zeros((1, B2, B2, B), dt)], axis=0
        )
        p_shapes = [
            (NSLOT, B2, B2, S, LANE), (NSLOT, B2, B2, S, LANE)
        ]
    aq = jnp.abs(qp._interleave(qp.q_vec))

    def tile(a):
        return a.reshape(*a.shape[:-1], GS, LANE)

    D0 = jnp.ones((W, B2, GS, LANE), dt)
    E0 = jnp.ones((W, Rp, GS, LANE), dt)
    c0 = jnp.ones((GS, LANE), dt)

    kernel = _make_kernel(
        W=W, N=N, Rp=Rp, CRp=CRp, S=S, iters=iters,
        row_off=row_off, coef_off=coef_off,
        ball_rows=ball_rows, ball_coefs=ball_coefs,
        n_obstacles=qp.n_obstacles, p_structure=qp.p_structure,
    )

    D_t, E_t, c_t = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # ac
            pl.BlockSpec(memory_space=pl.ANY),  # aPd
            pl.BlockSpec(memory_space=pl.ANY),  # aPl
            pl.BlockSpec(memory_space=pl.ANY),  # aq
            pl.BlockSpec((S, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # D (aliased out 0)
            pl.BlockSpec(memory_space=pl.ANY),  # E (aliased out 1)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((S, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((W, B2, GS, LANE), dt),
            jax.ShapeDtypeStruct((W, Rp, GS, LANE), dt),
            jax.ShapeDtypeStruct((GS, LANE), dt),
        ),
        input_output_aliases={5: 0, 6: 1},
        scratch_shapes=[
            pltpu.VMEM((NSLOT, CRp, S, LANE), dt),
            pltpu.VMEM(p_shapes[0], dt),
            pltpu.VMEM(p_shapes[1], dt),
            pltpu.VMEM((NSLOT, B2, S, LANE), dt),
            pltpu.VMEM((NSLOT, B2, S, LANE), dt),
            pltpu.VMEM((NSLOT, Rp, S, LANE), dt),
            pltpu.VMEM((1, B2, S, LANE), dt),
            pltpu.VMEM((1, Rp, S, LANE), dt),
            pltpu.SemaphoreType.DMA((NSLOT,)),
            pltpu.SemaphoreType.DMA((NSLOT,)),
            pltpu.SemaphoreType.DMA((NSLOT,)),
            pltpu.SemaphoreType.DMA((NSLOT,)),
            pltpu.SemaphoreType.DMA((NSLOT,)),
            pltpu.SemaphoreType.DMA((NSLOT,)),
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile(ac), tile(aPd), tile(aPl), tile(aq), c0, D0, E0)

    D_int = D_t.reshape(W, B2, B)  # interleaved per waypoint
    D = qp._deinterleave(D_int)
    E = E_t.reshape(W * Rp, B)
    c = c_t.reshape(B)
    scaled = qp.scale_data(D, E, c)
    scaling = Scaling(D=D, E=E, c=c, Dinv=1.0 / D, Einv=1.0 / E, cinv=1.0 / c)
    return scaled, scaling
