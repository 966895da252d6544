"""Streaming termination-quantities kernel for the fused lane driver.

The OSQP termination check needs six matvec-class passes (Ax, Px, Aᵀy for
residuals; A dx, P dx, Aᵀ dy for the infeasibility certificates) plus ~50
reductions — ~11 ms per check as XLA ops at batch 1024 on the tunneled
v5e, as much as 12 fused ADMM iterations.  This kernel computes every
per-problem reduction the decision needs
(:class:`osqp_solver_tpu.ops.admm_lane.TermQuantities`) in ONE streaming
pass over the horizon: all six matvecs are waypoint-local stencils (A rows
touch waypoints t, t+1; Aᵀ/P touch t−1, t, t+1), so with 4-slot buffering
the whole check is one pass of running maxima/sums.

Certificate matvecs use the scaled-operator identities
``A_base·dx_u = Einv·(A_s·dx)``, ``Aᵀ_base·dy_u = cinv·Dinv·(Aᵀ_s·dy)``,
``P_base·dx_u = cinv·Dinv·(P_s·dx)`` (exact up to one D·Dinv ulp — the jnp
path multiplies base coefficients instead), so only the scaled problem
streams.  Parity: tests/test_residuals_pallas.py.

Reference anchor: OSQP termination + infeasibility certificates as used at
``/root/reference/src/osqp-wrapper.h`` (SURVEY §2.2).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .admm import INF_THRESHOLD
from .admm_lane import TermQuantities

LANE = 128
MAX_SUBLANES = 8
NSLOT = 4

# accumulator rows in the output pack
_ACC = dict(
    prim_res=0, normEAx=1, normEz=2, dual_raw=3, normDPx=4, normDATy=5,
    normEdy=6, norm_dx=7, At_dy=8, support=9, loose_pos=10, loose_neg=11,
    Pdx_max=12, Adx_max=13, Adx_min=14, q_dot=15, xsum=16, ysum=17,
)
_NACC = 24  # padded to sublane multiple


def _tri_low(B2):
    low = {}
    k = 0
    for i in range(B2):
        for j in range(i + 1):
            low[(i, j)] = k
            k += 1
    return low, -(-len(low) // 8) * 8


def build_residual_packs(scaled, scaling):
    """Per-solve constants for the kernel.

    Returns ``(rowc (W, 4Rp, B), varc (W, VCp, B), Pdp (W, Tp, B),
    Plf (W, (2N)², B), norm_Dq (B,))``."""
    W, N = scaled.waypoints, scaled.n_dim
    Rp = scaled.rows_per_waypoint_padded
    B = scaled.batch
    B2 = 2 * N
    E3 = scaling.E.reshape(W, Rp, B)
    Einv3 = scaling.Einv.reshape(W, Rp, B)
    l3 = scaled.l.reshape(W, Rp, B)
    u3 = scaled.u.reshape(W, Rp, B)
    rowc = jnp.concatenate([E3, Einv3, l3, u3], axis=1)

    q_i = scaled._interleave(scaled.q_vec)
    D_i = scaled._interleave(scaling.D)
    Dinv_i = scaled._interleave(scaling.Dinv)
    varc = jnp.concatenate([q_i, D_i, Dinv_i], axis=1)
    VC = 3 * B2
    VCp = -(-VC // 8) * 8
    if VCp > VC:
        varc = jnp.concatenate(
            [varc, jnp.zeros((W, VCp - VC, B), varc.dtype)], axis=1
        )

    if scaled.p_structure == "vel_diag":
        Np = -(-N // 8) * 8
        dt = scaled.P_diag.dtype
        Pdp = jnp.stack(
            [scaled.P_diag[:, N + j, N + j] for j in range(N)], axis=1
        )
        Plf = jnp.stack(
            [scaled.P_lower[:, N + j, N + j] for j in range(N)], axis=1
        )
        Plf = jnp.concatenate([Plf, jnp.zeros((1, N, B), dt)], axis=0)
        if Np > N:
            padz = lambda a: jnp.concatenate(  # noqa: E731
                [a, jnp.zeros((W, Np - N, B), dt)], axis=1
            )
            Pdp, Plf = padz(Pdp), padz(Plf)
    else:
        low, Tp = _tri_low(B2)
        low_flat = [i * B2 + j for (i, j) in sorted(low, key=low.get)]
        Pdp = scaled.P_diag.reshape(W, B2 * B2, B)[:, jnp.asarray(low_flat)]
        if Tp > len(low_flat):
            Pdp = jnp.concatenate(
                [Pdp, jnp.zeros((W, Tp - len(low_flat), B), Pdp.dtype)],
                axis=1,
            )
        Plf = jnp.concatenate(
            [
                scaled.P_lower.reshape(W - 1, B2 * B2, B),
                jnp.zeros((1, B2 * B2, B), scaled.P_lower.dtype),
            ],
            axis=0,
        )
    norm_Dq = jnp.max(jnp.abs(scaling.Dinv * scaled.q), axis=0)
    return rowc, varc, Pdp, Plf, norm_Dq


def _make_kernel(*, W, N, Rp, CRp, SRp, DRp, VCp, Tp, S, row_off, coef_off,
                 ball_rows, ball_coefs, n_obstacles, p_structure):
    B2 = 2 * N
    vel_diag = p_structure == "vel_diag"
    X0, Z0, Y0 = 0, B2, B2 + Rp
    LOW, _ = _tri_low(B2)
    # rowc offsets
    RE, REI, RL, RU = 0, Rp, 2 * Rp, 3 * Rp
    # varc offsets
    VQ, VD, VDI = 0, B2, 2 * B2

    def kernel(
        coef_hbm, pdp_hbm, plf_hbm, state_hbm, dxdy_hbm, rowc_hbm, varc_hbm,
        acc_vmem,
        fb, pdb, plb, sb, db, rb, vb,
        fs, pds, pls, ss, ds, rs, vs,
    ):
        sub0 = pl.program_id(0) * S
        zero = jnp.zeros((S, LANE), fb.dtype)
        ninf = jnp.full((S, LANE), -jnp.inf, fb.dtype)
        pinf = jnp.full((S, LANE), jnp.inf, fb.dtype)

        def rdma(hbm, buf, sem, slot, t):
            idx = (t,) + (slice(None),) * (len(hbm.shape) - 3) + (
                pl.ds(sub0, S), slice(None),
            )
            return pltpu.make_async_copy(hbm.at[idx], buf.at[slot], sem.at[slot])

        streams = (
            (coef_hbm, fb, fs), (pdp_hbm, pdb, pds), (plf_hbm, plb, pls),
            (state_hbm, sb, ss), (dxdy_hbm, db, ds), (rowc_hbm, rb, rs),
            (varc_hbm, vb, vs),
        )

        def start(slot, t):
            for hbm, buf, sem in streams:
                rdma(hbm, buf, sem, slot, t).start()

        def wait(slot, t):
            for hbm, buf, sem in streams:
                rdma(hbm, buf, sem, slot, t).wait()

        def Pd(slot, i, j):
            return pdb[slot, LOW[(i, j)] if j <= i else LOW[(j, i)]]

        def Pl(slot, i, j):
            return plb[slot, i * B2 + j]

        start(0, 0)

        def body(t, carry):
            acc = dict(zip(sorted(_ACC, key=_ACC.get), carry))
            u = t - 1
            s_u = (t - 1) % NSLOT
            s_t = t % NSLOT
            s_p = (t - 2) % NSLOT

            @pl.when(t + 1 < W)
            def _():
                start((t + 1) % NSLOT, t + 1)

            @pl.when(t < W)
            def _():
                wait(s_t, t)

            have_u = (t >= 1) & (t <= W)
            have_prev = t >= 2
            have_next = t <= W - 1

            def m(pred, v):
                return jnp.where(pred, v, 0.0)

            def xrow(slot, i):
                return sb[slot, X0 + i]

            def dxrow(slot, i):
                return db[slot, i]

            # ---- A rows at u for x and dx (same stencil as the chunk
            # kernel's A-row apply; x_{u+1} from slot s_t).
            def a_rows(val, nxt):
                rows = [None] * Rp
                for j in range(N):
                    rows[row_off["dyn"] + j] = (
                        fb[s_u, coef_off["c0"] + j] * val(s_u, N + j)
                        + m(have_next,
                            fb[s_u, coef_off["c1"] + j] * nxt(s_t, j))
                        + fb[s_u, coef_off["c2"] + j] * val(s_u, j)
                    )
                    rows[row_off["pos"] + j] = (
                        fb[s_u, coef_off["pos"] + j] * val(s_u, j)
                    )
                    rows[row_off["vel"] + j] = (
                        fb[s_u, coef_off["vel"] + j] * val(s_u, N + j)
                    )
                    rows[row_off["acc"] + j] = (
                        m(have_next,
                          fb[s_u, coef_off["a0"] + j] * nxt(s_t, N + j))
                        + fb[s_u, coef_off["a1"] + j] * val(s_u, N + j)
                    )
                for b in range(len(ball_rows)):
                    ws_r, obs_r = ball_rows[b]
                    ws_c, obs_c = ball_coefs[b]
                    if ws_r is not None:
                        for a3 in range(3):
                            s = zero
                            for j in range(N):
                                s = s + fb[s_u, ws_c + a3 * N + j] * val(
                                    s_u, j
                                )
                            rows[ws_r + a3] = s
                    if obs_r is not None:
                        for o in range(n_obstacles):
                            s = zero
                            for j in range(N):
                                s = s + fb[s_u, obs_c + o * N + j] * val(
                                    s_u, j
                                )
                            rows[obs_r + o] = s
                return [r if r is not None else zero for r in rows]

            Ax = a_rows(xrow, xrow)
            Adx = a_rows(dxrow, dxrow)

            # ---- Aᵀ rows at u for y and dy (gather rows of u−1, u).
            def at_rows(yrow):
                out = [zero] * B2
                for j in range(N):
                    g = fb[s_u, coef_off["c2"] + j] * yrow(
                        s_u, row_off["dyn"] + j
                    )
                    g = g + m(have_prev,
                              fb[s_p, coef_off["c1"] + j]
                              * yrow(s_p, row_off["dyn"] + j))
                    g = g + fb[s_u, coef_off["pos"] + j] * yrow(
                        s_u, row_off["pos"] + j
                    )
                    for b in range(len(ball_rows)):
                        ws_r, obs_r = ball_rows[b]
                        ws_c, obs_c = ball_coefs[b]
                        if ws_r is not None:
                            for a3 in range(3):
                                g = g + fb[s_u, ws_c + a3 * N + j] * yrow(
                                    s_u, ws_r + a3
                                )
                        if obs_r is not None:
                            for o in range(n_obstacles):
                                g = g + fb[s_u, obs_c + o * N + j] * yrow(
                                    s_u, obs_r + o
                                )
                    out[j] = g
                    gv = fb[s_u, coef_off["c0"] + j] * yrow(
                        s_u, row_off["dyn"] + j
                    )
                    gv = gv + fb[s_u, coef_off["vel"] + j] * yrow(
                        s_u, row_off["vel"] + j
                    )
                    gv = gv + fb[s_u, coef_off["a1"] + j] * yrow(
                        s_u, row_off["acc"] + j
                    )
                    gv = gv + m(have_prev,
                                fb[s_p, coef_off["a0"] + j]
                                * yrow(s_p, row_off["acc"] + j))
                    out[N + j] = gv
                return out

            ATy = at_rows(lambda sl, r: sb[sl, Y0 + r])
            ATdy = at_rows(lambda sl, r: db[sl, B2 + r])

            # ---- P·x and P·dx at u: Pd_u v_u + Pl_{u−1} v_{u−1} + Pl_uᵀ v_{u+1}.
            # "vel_diag": only velocity-diagonal entries (pdb/plb hold the
            # (W, Np, B) diagonal packs).
            def p_rows(val):
                if vel_diag:
                    out = [zero] * N
                    for j in range(N):
                        s = pdb[s_u, j] * val(s_u, N + j)
                        sp = plb[s_p, j] * val(s_p, N + j)
                        sn = plb[s_u, j] * val(s_t, N + j)
                        out.append(s + m(have_prev, sp) + m(have_next, sn))
                    return out
                out = []
                for i in range(B2):
                    s = zero
                    for j in range(B2):
                        s = s + Pd(s_u, i, j) * val(s_u, j)
                    sp = zero
                    for j in range(B2):
                        sp = sp + Pl(s_p, i, j) * val(s_p, j)
                    sn = zero
                    for j in range(B2):
                        sn = sn + Pl(s_u, j, i) * val(s_t, j)
                    out.append(s + m(have_prev, sp) + m(have_next, sn))
                return out

            Px = p_rows(xrow)
            Pdx = p_rows(dxrow)

            # ---- reductions -------------------------------------------------
            def amax(a, v):
                return jnp.maximum(a, jnp.where(have_u, v, 0.0))

            pr = zero
            nax = zero
            nz = zero
            nedy = zero
            atdy = zero
            sup = zero
            lpos = zero
            lneg = zero
            adx_mx = ninf
            adx_mn = pinf
            ys = zero
            for r in range(Rp):
                Einv_r = rb[s_u, REI + r]
                E_r = rb[s_u, RE + r]
                z_r = sb[s_u, Z0 + r]
                y_r = sb[s_u, Y0 + r]
                dy_r = db[s_u, B2 + r]
                pr = jnp.maximum(pr, jnp.abs(Einv_r * (Ax[r] - z_r)))
                nax = jnp.maximum(nax, jnp.abs(Einv_r * Ax[r]))
                nz = jnp.maximum(nz, jnp.abs(Einv_r * z_r))
                edy = E_r * dy_r
                nedy = jnp.maximum(nedy, jnp.abs(edy))
                edy_pos = jnp.maximum(edy, 0.0)
                edy_neg = jnp.minimum(edy, 0.0)
                u_b = Einv_r * rb[s_u, RU + r]
                l_b = Einv_r * rb[s_u, RL + r]
                loose_u = u_b >= INF_THRESHOLD
                loose_l = l_b <= -INF_THRESHOLD
                sup = sup + jnp.where(loose_u, 0.0, u_b * edy_pos) + jnp.where(
                    loose_l, 0.0, l_b * edy_neg
                )
                lpos = jnp.maximum(lpos, jnp.where(loose_u, edy_pos, 0.0))
                lneg = jnp.maximum(lneg, jnp.where(loose_l, -edy_neg, 0.0))
                eadx = Einv_r * Adx[r]
                adx_mx = jnp.maximum(
                    adx_mx, jnp.where(have_u & ~loose_u, eadx, ninf)
                )
                adx_mn = jnp.minimum(
                    adx_mn, jnp.where(have_u & ~loose_l, eadx, pinf)
                )
                ys = ys + y_r

            draw = zero
            ndpx = zero
            ndaty = zero
            ndx = zero
            npdx = zero
            qdot = zero
            xs = zero
            for i in range(B2):
                Dinv_i = vb[s_u, VDI + i]
                D_i = vb[s_u, VD + i]
                q_i = vb[s_u, VQ + i]
                x_i = sb[s_u, X0 + i]
                dx_i = db[s_u, i]
                draw = jnp.maximum(
                    draw, jnp.abs(Dinv_i * (Px[i] + q_i + ATy[i]))
                )
                ndpx = jnp.maximum(ndpx, jnp.abs(Dinv_i * Px[i]))
                ndaty = jnp.maximum(ndaty, jnp.abs(Dinv_i * ATy[i]))
                ndx = jnp.maximum(ndx, jnp.abs(D_i * dx_i))
                npdx = jnp.maximum(npdx, jnp.abs(Dinv_i * Pdx[i]))
                atdy = jnp.maximum(atdy, jnp.abs(Dinv_i * ATdy[i]))
                qdot = qdot + q_i * dx_i
                xs = xs + x_i

            acc["prim_res"] = amax(acc["prim_res"], pr)
            acc["normEAx"] = amax(acc["normEAx"], nax)
            acc["normEz"] = amax(acc["normEz"], nz)
            acc["dual_raw"] = amax(acc["dual_raw"], draw)
            acc["normDPx"] = amax(acc["normDPx"], ndpx)
            acc["normDATy"] = amax(acc["normDATy"], ndaty)
            acc["normEdy"] = amax(acc["normEdy"], nedy)
            acc["norm_dx"] = amax(acc["norm_dx"], ndx)
            acc["At_dy"] = amax(acc["At_dy"], atdy)
            acc["support"] = acc["support"] + jnp.where(have_u, sup, 0.0)
            acc["loose_pos"] = amax(acc["loose_pos"], lpos)
            acc["loose_neg"] = amax(acc["loose_neg"], lneg)
            acc["Pdx_max"] = amax(acc["Pdx_max"], npdx)
            acc["Adx_max"] = jnp.maximum(
                acc["Adx_max"], jnp.where(have_u, adx_mx, ninf)
            )
            acc["Adx_min"] = jnp.minimum(
                acc["Adx_min"], jnp.where(have_u, adx_mn, pinf)
            )
            acc["q_dot"] = acc["q_dot"] + jnp.where(have_u, qdot, 0.0)
            acc["xsum"] = acc["xsum"] + jnp.where(have_u, xs, 0.0)
            acc["ysum"] = acc["ysum"] + jnp.where(have_u, ys, 0.0)
            return tuple(acc[k] for k in sorted(_ACC, key=_ACC.get))

        init = []
        for k in sorted(_ACC, key=_ACC.get):
            if k == "Adx_max":
                init.append(ninf)
            elif k == "Adx_min":
                init.append(pinf)
            else:
                init.append(zero)
        out = jax.lax.fori_loop(0, W + 1, body, tuple(init))
        for k, idx in _ACC.items():
            acc_vmem[idx] = out[idx]
        for idx in range(len(_ACC), _NACC):
            acc_vmem[idx] = zero

    return kernel


def termination_quantities_kernel(
    scaled, state_pack, dxdy_pack, coef, packs, interpret=None
) -> TermQuantities:
    """Run the streaming pass and assemble :class:`TermQuantities`.

    ``state_pack``/``dxdy_pack``: the fused chunk kernel's packed outputs
    (``(W, SRp, B)`` / ``(W, DRp, B)``); ``coef``: the stencil pack;
    ``packs``: :func:`build_residual_packs` output; ``scaling`` scalars are
    applied here (cinv factors — see module docstring identities).
    """
    from .admm_fused import (
        _coef_layout,
        _row_layout,
        dxdy_rows,
        state_rows,
    )

    rowc, varc, Pdp, Plf, norm_Dq = packs[:5]
    cinv = packs[5]
    W, N, B = scaled.waypoints, scaled.n_dim, scaled.batch
    Rp = scaled.rows_per_waypoint_padded
    _, SRp = state_rows(scaled)
    _, DRp = dxdy_rows(scaled)
    row_off, ball_rows = _row_layout(scaled)
    coef_off, ball_coefs, _, CRp = _coef_layout(scaled)
    _, Tp = _tri_low(2 * N)
    VCp = varc.shape[1]
    dt = scaled.q_vec.dtype
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    GS = B // LANE
    S = min(MAX_SUBLANES, GS)
    grid = GS // S

    def tile(a):
        return a.reshape(*a.shape[:-1], GS, LANE)

    kernel = _make_kernel(
        W=W, N=N, Rp=Rp, CRp=CRp, SRp=SRp, DRp=DRp, VCp=VCp, Tp=Tp, S=S,
        row_off=row_off, coef_off=coef_off,
        ball_rows=ball_rows, ball_coefs=ball_coefs,
        n_obstacles=scaled.n_obstacles, p_structure=scaled.p_structure,
    )

    acc = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 7,
        out_specs=pl.BlockSpec(
            (_NACC, S, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((_NACC, GS, LANE), dt),
        scratch_shapes=[
            pltpu.VMEM((NSLOT, CRp, S, LANE), dt),
            pltpu.VMEM((NSLOT, Pdp.shape[1], S, LANE), dt),
            pltpu.VMEM((NSLOT, Plf.shape[1], S, LANE), dt),
            pltpu.VMEM((NSLOT, SRp, S, LANE), dt),
            pltpu.VMEM((NSLOT, DRp, S, LANE), dt),
            pltpu.VMEM((NSLOT, 4 * Rp, S, LANE), dt),
            pltpu.VMEM((NSLOT, VCp, S, LANE), dt),
        ] + [pltpu.SemaphoreType.DMA((NSLOT,))] * 7,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        tile(coef), tile(Pdp), tile(Plf), tile(state_pack),
        tile(dxdy_pack), tile(rowc), tile(varc),
    )

    return assemble_term_quantities(acc.reshape(_NACC, B), cinv, norm_Dq)


def assemble_term_quantities(acc, cinv, norm_Dq) -> TermQuantities:
    """(NACC, B) raw accumulators → :class:`TermQuantities` (applies the
    host-side cinv/norm_Dq combines).  Shared by this kernel and the
    termination-fused chunk kernel (ops/admm_fused.py emit_term path)."""

    def g(k):
        return acc[_ACC[k]]

    return TermQuantities(
        prim_res=g("prim_res"),
        dual_res=cinv * g("dual_raw"),
        prim_norm=jnp.maximum(g("normEAx"), g("normEz")),
        dual_norm=cinv * jnp.maximum(
            jnp.maximum(g("normDPx"), g("normDATy")), norm_Dq
        ),
        norm_dy=cinv * g("normEdy"),
        norm_dx=g("norm_dx"),
        At_dy_max=cinv * g("At_dy"),
        support=cinv * g("support"),
        loose_dy_pos_max=cinv * g("loose_pos"),
        loose_dy_neg_max=cinv * g("loose_neg"),
        P_dx_max=cinv * g("Pdx_max"),
        A_dx_max=g("Adx_max"),
        A_dx_min=g("Adx_min"),
        q_dot_dx=cinv * g("q_dot"),
        blew_up=~jnp.isfinite(g("xsum") + g("ysum")),
    )
