"""Fused KKT assemble + block-Cholesky + pack Pallas kernel.

The lane driver's factor path used to be three HBM round-trips:
``kkt_blocks`` materializes the (W, 2N, 2N, B) block-tridiagonal KKT
(~118 MB at batch 1024 — 6.5 ms of pure XLA elementwise assembly),
``factor_lane_major`` streams it back through the Cholesky recurrence
(2.7 ms), and ``pack_factor`` re-reads the full blocks to emit the packed
triangular layout the fused ADMM chunk kernel consumes (2.0 ms).  The KKT
blocks are a *stencil product*: every entry of ``P + σI + Aᵀdiag(ρ)A`` is a
few multiplies of the per-waypoint constraint coefficients — the same
(W, CRp, B) pack the chunk kernel already streams — so this kernel builds
each 2N×2N block in VMEM from the stencil, runs the Cholesky step, and
writes ONLY the packed triangular factor.  One pass, ~115 MB of traffic
instead of ~350 MB, and the full-block factor never exists.

``gain`` is exactly upper-triangular for the trajectory-QP family (the
coupling block is upper-triangular — see ops/admm_fused.py packed-factor
notes), so only its 2N(2N+1)/2 entries are computed, halving the
``G = L·C⁻ᵀ`` work of the generic factor kernel.

Supported for ``p_structure == "vel_diag"`` (the GOMP objective: P nonzero
only on the velocity diagonal — reference ``constraint-builder.h:43-56``
builds exactly this); other structures fall back to the generic path.

Reference anchor: OSQP setup/factorization step (qdldl LDLᵀ of the reduced
KKT, SURVEY §2.2/§3.4) — here re-designed as a streaming batched kernel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .admm_fused import LANE, MAX_SUBLANES, _coef_layout, _row_layout, _tri_maps


def factor_packed_supported(qp) -> bool:
    B = qp.batch
    if B % LANE:
        return False
    GS = B // LANE
    S = min(MAX_SUBLANES, GS)
    return (
        qp.row_layout == "waypoint"
        and qp.p_structure == "vel_diag"
        and GS % S == 0
    )


def build_p_vel_packs(qp):
    """(W, Np, B) velocity-diagonal entries of P_diag / P_lower (last row of
    the lower pack is zero so both stream W steps)."""
    W, N, B = qp.waypoints, qp.n_dim, qp.batch
    dt = qp.P_diag.dtype
    Np = -(-N // 8) * 8
    Pd = jnp.stack([qp.P_diag[:, N + j, N + j] for j in range(N)], axis=1)
    Pl = jnp.stack([qp.P_lower[:, N + j, N + j] for j in range(N)], axis=1)
    Pl = jnp.concatenate([Pl, jnp.zeros((1, N, B), dt)], axis=0)
    if Np > N:
        pad = lambda a: jnp.concatenate(  # noqa: E731
            [a, jnp.zeros((W, Np - N, B), dt)], axis=1
        )
        Pd, Pl = pad(Pd), pad(Pl)
    return Pd, Pl


def _make_kernel(*, W, N, S, sigma, row_off, coef_off, ball_rows, ball_coefs,
                 n_obstacles, emit_gain=True):
    B2 = 2 * N
    LOW, UP, Tp = _tri_maps(B2)

    def kernel(*refs):
        if emit_gain:
            (coef_hbm, rho_hbm, pd_hbm, plf_hbm,
             cholp_hbm, gainp_hbm,
             fbuf, rbuf, pdb, plb, cob, gob,
             fsem, rsem, pdsem, plsem, cosem, gosem) = refs
        else:
            # hrec factor form: G is still computed (the Schur recursion
            # needs it) but never written to HBM — the chunk kernel rebuilds
            # the sparse coupling Ml in-registers instead.
            (coef_hbm, rho_hbm, pd_hbm, plf_hbm,
             cholp_hbm,
             fbuf, rbuf, pdb, plb, cob, gob,
             fsem, rsem, pdsem, plsem, cosem) = refs
            gainp_hbm = gosem = None
        sub0 = pl.program_id(0) * S
        zero = jnp.zeros((S, LANE), fbuf.dtype)

        def dma(hbm, buf, sem, slot, t):
            idx = (t,) + (slice(None),) * (len(hbm.shape) - 3) + (
                pl.ds(sub0, S), slice(None),
            )
            return pltpu.make_async_copy(hbm.at[idx], buf.at[slot], sem.at[slot])

        streams = (
            (coef_hbm, fbuf, fsem), (rho_hbm, rbuf, rsem),
            (pd_hbm, pdb, pdsem), (plf_hbm, plb, plsem),
        )

        def start(slot, t):
            for hbm, buf, sem in streams:
                dma(hbm, buf, sem, slot, t).start()

        def wait(slot, t):
            for hbm, buf, sem in streams:
                dma(hbm, buf, sem, slot, t).wait()

        start(0, 0)

        def body(t, carry):
            c1sq_p, a0sq_p = carry
            s = t % 2
            sp = (t + 1) % 2  # previous step's slot (holds packed G_{t-1})

            @pl.when(t + 1 < W)
            def _():
                start(sp, t + 1)

            wait(s, t)

            def f(k):
                return fbuf[s, k]

            def r(k):
                return rbuf[s, k]

            # ---- Aᵀdiag(ρ)A stencil pieces (mirrors kkt_blocks; the pads
            # there are automatic here: coef rows are zero past their horizon).
            d_qq, d_vv, d_qv = [], [], []
            c1sq_n, a0sq_n = [], []
            for j in range(N):
                rd = r(row_off["dyn"] + j)
                ra = r(row_off["acc"] + j)
                c0 = f(coef_off["c0"] + j)
                c1 = f(coef_off["c1"] + j)
                c2 = f(coef_off["c2"] + j)
                a0 = f(coef_off["a0"] + j)
                a1 = f(coef_off["a1"] + j)
                po = f(coef_off["pos"] + j)
                ve = f(coef_off["vel"] + j)
                d_qq.append(
                    r(row_off["pos"] + j) * po * po + rd * c2 * c2 + c1sq_p[j]
                )
                d_vv.append(
                    rd * c0 * c0
                    + r(row_off["vel"] + j) * ve * ve
                    + a0sq_p[j]
                    + ra * a1 * a1
                )
                d_qv.append(rd * c2 * c0)
                c1sq_n.append(rd * c1 * c1)
                a0sq_n.append(ra * a0 * a0)

            # Dense q-block workspace/obstacle JᵀρJ (lower half).
            ws = [[zero] * N for _ in range(N)]
            for b in range(len(ball_rows)):
                ws_r, obs_r = ball_rows[b]
                ws_c, obs_c = ball_coefs[b]
                if ws_r is not None:
                    for a3 in range(3):
                        rr = r(ws_r + a3)
                        for i in range(N):
                            fi = f(ws_c + a3 * N + i) * rr
                            for j in range(i + 1):
                                ws[i][j] = ws[i][j] + fi * f(ws_c + a3 * N + j)
                if obs_r is not None:
                    for o in range(n_obstacles):
                        rr = r(obs_r + o)
                        for i in range(N):
                            fi = f(obs_c + o * N + i) * rr
                            for j in range(i + 1):
                                ws[i][j] = ws[i][j] + fi * f(obs_c + o * N + j)

            # ---- M_diag (lower half; vel_diag P adds only to the v diagonal).
            Md = [[zero] * B2 for _ in range(B2)]
            for i in range(N):
                for j in range(i):
                    Md[i][j] = ws[i][j]
                Md[i][i] = ws[i][i] + d_qq[i] + sigma
            for j in range(N):
                Md[N + j][j] = d_qv[j]
                Md[N + j][N + j] = d_vv[j] + pdb[s, j] + sigma

            # ---- S = Md − G_{t-1} G_{t-1}ᵀ (G packed upper in gob[sp]).
            Smat = [[None] * B2 for _ in range(B2)]
            for i in range(B2):
                for j in range(i + 1):
                    acc = zero
                    for k in range(i, B2):
                        acc = acc + gob[sp, UP[(i, k)]] * gob[sp, UP[(j, k)]]
                    Smat[i][j] = jnp.where(t > 0, Md[i][j] - acc, Md[i][j])

            # ---- Cholesky (column-major; reciprocal diagonal to keep the
            # division count at one per column).
            C = [[None] * B2 for _ in range(B2)]
            idia = [None] * B2
            for jj in range(B2):
                sdd = Smat[jj][jj]
                for k in range(jj):
                    sdd = sdd - C[jj][k] * C[jj][k]
                d = jnp.sqrt(sdd)
                C[jj][jj] = d
                idia[jj] = 1.0 / d
                for i in range(jj + 1, B2):
                    sij = Smat[i][jj]
                    for k in range(jj):
                        sij = sij - C[i][k] * C[jj][k]
                    C[i][jj] = sij * idia[jj]

            # ---- M_lower (upper-triangular) and G = M_lower·C⁻ᵀ (upper).
            Ml = [[zero] * B2 for _ in range(B2)]
            for j in range(N):
                rd = r(row_off["dyn"] + j)
                c0 = f(coef_off["c0"] + j)
                c1 = f(coef_off["c1"] + j)
                c2 = f(coef_off["c2"] + j)
                Ml[j][j] = rd * c1 * c2
                Ml[j][N + j] = rd * c1 * c0
                Ml[N + j][N + j] = (
                    r(row_off["acc"] + j)
                    * f(coef_off["a0"] + j)
                    * f(coef_off["a1"] + j)
                    + plb[s, j]
                )
            G = {}
            for i in range(B2):
                for j in range(i, B2):
                    sij = Ml[i][j]
                    for k in range(i, j):
                        sij = sij - G[(i, k)] * C[j][k]
                    G[(i, j)] = sij * idia[j]

            # ---- pack + write out (gob[s] is reread next step as G_t).
            for (i, j), k in LOW.items():
                cob[s, k] = C[i][j]
            for (i, j), k in UP.items():
                gob[s, k] = G[(i, j)]
            for k in range(len(LOW), Tp):
                cob[s, k] = zero
                gob[s, k] = zero
            cw = dma_out(cholp_hbm, cob, cosem, s, t)
            cw.start()
            if emit_gain:
                gw = dma_out(gainp_hbm, gob, gosem, s, t)
                gw.start()
                cw.wait()
                gw.wait()
            else:
                cw.wait()
            return tuple(c1sq_n), tuple(a0sq_n)

        def dma_out(hbm, buf, sem, slot, t):
            return pltpu.make_async_copy(
                buf.at[slot],
                hbm.at[t, :, pl.ds(sub0, S), :],
                sem.at[slot],
            )

        zN = tuple(jnp.zeros((S, LANE), fbuf.dtype) for _ in range(N))
        jax.lax.fori_loop(0, W, body, (zN, zN))

    return kernel, Tp


def factor_packed_lane(scaled, rho_vec, sigma, coef=None, interpret=None,
                       emit_gain=True):
    """Packed triangular KKT factor straight from the stencil.

    ``scaled``: waypoint-layout vel_diag :class:`LaneTrajectoryQP` (Ruiz
    scaled); ``rho_vec``: (m, B).  Returns ``(cholp, gainp)`` each
    (W, Tp, B) — bit-compatible with
    ``admm_fused.pack_factor(qp, qp.kkt_factor(rho_vec, sigma))`` up to f32
    reassociation (parity: tests/test_kkt_factor_pallas.py).

    ``emit_gain=False`` (the ``factor_form="hrec"`` chunk path) skips the
    gain write entirely — output traffic halves — and returns
    ``(cholp, None)``.
    """
    from .admm_fused import build_coef_pack

    W, N, B = scaled.waypoints, scaled.n_dim, scaled.batch
    Rp = scaled.rows_per_waypoint_padded
    row_off, ball_rows = _row_layout(scaled)
    coef_off, ball_coefs, _, CRp = _coef_layout(scaled)
    dt = scaled.q_vec.dtype
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    GS = B // LANE
    S = min(MAX_SUBLANES, GS)
    grid = GS // S

    if coef is None:
        coef = build_coef_pack(scaled)
    Pd, Pl = build_p_vel_packs(scaled)
    Np = Pd.shape[1]
    rho3 = rho_vec.reshape(W, Rp, B)

    kernel, Tp = _make_kernel(
        W=W, N=N, S=S, sigma=float(sigma),
        row_off=row_off, coef_off=coef_off,
        ball_rows=ball_rows, ball_coefs=ball_coefs,
        n_obstacles=scaled.n_obstacles, emit_gain=emit_gain,
    )

    def tile(a):
        return a.reshape(*a.shape[:-1], GS, LANE)

    n_out = 2 if emit_gain else 1
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=tuple(
            pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_out)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((W, Tp, GS, LANE), dt) for _ in range(n_out)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CRp, S, LANE), dt),
            pltpu.VMEM((2, Rp, S, LANE), dt),
            pltpu.VMEM((2, Np, S, LANE), dt),
            pltpu.VMEM((2, Np, S, LANE), dt),
            pltpu.VMEM((2, Tp, S, LANE), dt),
            pltpu.VMEM((2, Tp, S, LANE), dt),
        ] + [pltpu.SemaphoreType.DMA((2,))] * (4 + n_out),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile(coef), tile(rho3), tile(Pd), tile(Pl))
    if emit_gain:
        cholp, gainp = outs
        return cholp.reshape(W, Tp, B), gainp.reshape(W, Tp, B)
    (cholp,) = outs
    return cholp.reshape(W, Tp, B), None
