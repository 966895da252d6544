"""Fused ADMM chunk kernel: whole iterations inside one Pallas program.

VERDICT r1 next-#2 / ROADMAP top perf item.  The lane-major driver
(:mod:`osqp_solver_tpu.ops.admm_lane`) runs each ADMM iteration as ~10 XLA
ops + 1 Pallas solve call; every op round-trips the (m, B)/(n, B) state
through HBM, and the solve kernel streams the KKT factor through two extra
HBM round-trips of RHS/solution.  This kernel fuses a whole chunk of
``check_termination`` iterations into ONE program.  Per iteration:

* a **forward streaming pass** over the horizon builds the reduced-KKT RHS
  ``σx − q + Aᵀ(ρz − y)`` waypoint-by-waypoint from the stencil
  coefficients (the Aᵀ gather is causal: waypoint t's rhs touches
  constraint rows of waypoints t−1 and t only) and immediately runs the
  forward block-substitution, keeping the intermediate ``w`` in VMEM;
* a **backward streaming pass** finishes the triangular solve and applies
  projection + dual update *in-stream*: as ``x̃_t`` emerges (descending t,
  so ``x̃_{t+1}`` is in registers), the A-row apply, over-relaxation, box
  projection, and dual update for waypoint t's rows complete and write back
  in a single DMA — no intermediate vector state materializes in HBM.

Requires the waypoint-major row layout
(:class:`~osqp_solver_tpu.gomp.trajectory_qp_lane.LaneTrajectoryQP` with
``row_layout="waypoint"``): waypoint t's constraint rows are one contiguous
(R, B) tile, and the per-iteration state ``[x_t; z_t; y_t]`` is one
contiguous (SR, B) tile of the stacked state array.  True VMEM residency of
the whole factor is impossible at W=100 × batch 1024 (the factor alone is
≈15 MB vs ~16 MB VMEM), so the TPU-correct form of "factor-resident chunk"
is this double-buffered stream fusion: the factor streams at full HBM
bandwidth once per pass while every vector flows through VMEM exactly once
per iteration.

Reference anchor: the OSQP ADMM hot loop (SURVEY §3.4) — per iteration one
cached-LDLᵀ solve + projection + dual update (α = 1.6 over-relaxation).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
MAX_SUBLANES = 8

# VMEM cap for the in-kernel w buffer (W, 2N, S, LANE) f32; beyond this the
# driver falls back to the unfused chunk loop.
_W_VMEM_BUDGET = 6 * 1024 * 1024


def _pad8(n: int) -> int:
    return -(-n // 8) * 8


def fused_chunk_supported(qp, settings) -> bool:
    if settings.fused_chunk == "off":
        return False
    if settings.fused_chunk == "auto" and jax.default_backend() != "tpu":
        return False
    B = qp.batch
    if B % LANE:
        return False
    GS = B // LANE
    S = min(MAX_SUBLANES, GS)
    if GS % S:
        return False
    return (
        qp.row_layout == "waypoint"
        and settings.kkt_method == "direct"
        and settings.kkt_refine == 0
    )


# ---------------------------------------------------------------------------
# Static layouts
# ---------------------------------------------------------------------------


def _row_layout(qp):
    """Per-waypoint row offsets inside the padded (Rp) row tile."""
    N = qp.n_dim
    off = {"dyn": 0, "pos": N, "vel": 2 * N, "acc": 3 * N}
    ball_rows = []
    o = 4 * N
    for b in range(qp.n_balls):
        ws_off = o if qp.gripper_flags[b] else None
        if qp.gripper_flags[b]:
            o += 3
        obs_off = o if qp.n_obstacles else None
        o += qp.n_obstacles
        ball_rows.append((ws_off, obs_off))
    return off, tuple(ball_rows)


def _coef_layout(qp):
    """Row offsets inside the per-waypoint coefficient pack (CRp rows)."""
    N = qp.n_dim
    off = {
        "c0": 0, "c1": N, "c2": 2 * N,
        "pos": 3 * N, "vel": 4 * N,
        "a0": 5 * N, "a1": 6 * N,
    }
    ball_coefs = []
    o = 7 * N
    for b in range(qp.n_balls):
        ws_off = o if qp.gripper_flags[b] else None
        if qp.gripper_flags[b]:
            o += 3 * N
        obs_off = o if qp.n_obstacles else None
        o += qp.n_obstacles * N
        ball_coefs.append((ws_off, obs_off))
    return off, tuple(ball_coefs), o, _pad8(o)


# ---------------------------------------------------------------------------
# Driver-side packing (pure jnp, shapes static)
# ---------------------------------------------------------------------------


def build_coef_pack(qp) -> jnp.ndarray:
    """(W, CRp, B) stencil coefficient pack — constant per solve."""
    W, N, B = qp.waypoints, qp.n_dim, qp.batch
    dt = qp.q_vec.dtype
    _, _, CR, CRp = _coef_layout(qp)

    def padW(x, missing):
        if not missing:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((missing,) + x.shape[1:], dt)], axis=0
        )

    c = qp.dyn_coef  # (W-1, N, 3, B)
    a = qp.acc_coef  # (W-2, N, 2, B)
    parts = [
        padW(c[..., 0, :], 1), padW(c[..., 1, :], 1), padW(c[..., 2, :], 1),
        qp.pos_coef, padW(qp.vel_coef, 1),
        padW(a[..., 0, :], 2), padW(a[..., 1, :], 2),
    ]
    for b in range(qp.n_balls):
        if qp.gripper_flags[b]:
            parts.append(qp.ws_jac[b].reshape(W, 3 * N, B))
        if qp.n_obstacles:
            parts.append(
                jnp.moveaxis(qp.obs_jac[b], 0, 1).reshape(
                    W, qp.n_obstacles * N, B
                )
            )
    coef = jnp.concatenate(parts, axis=1)
    if CRp > CR:
        coef = jnp.concatenate(
            [coef, jnp.zeros((W, CRp - CR, B), dt)], axis=1
        )
    return coef


def build_lu_pack(qp) -> jnp.ndarray:
    """(W, 2·Rp, B): per-waypoint lower bounds then upper bounds (scaled)."""
    W = qp.waypoints
    Rp = qp.rows_per_waypoint_padded
    B = qp.batch
    return jnp.concatenate(
        [qp.l.reshape(W, Rp, B), qp.u.reshape(W, Rp, B)], axis=1
    )


def state_rows(qp):
    """(SR, SRp): stacked per-waypoint state rows [x (2N); z (Rp); y (Rp)]."""
    SR = 2 * qp.n_dim + 2 * qp.rows_per_waypoint_padded
    return SR, _pad8(SR)


def dxdy_rows(qp):
    DR = 2 * qp.n_dim + qp.rows_per_waypoint_padded
    return DR, _pad8(DR)


def pack_state(qp, x, z, y):
    """x (n, B) flat, z/y (m, B) waypoint-major → stacked (W, SRp, B)."""
    W, N = qp.waypoints, qp.n_dim
    Rp = qp.rows_per_waypoint_padded
    B = x.shape[-1]
    SR, SRp = state_rows(qp)
    xi = qp._interleave(x)  # (W, 2N, B)
    parts = [xi, z.reshape(W, Rp, B), y.reshape(W, Rp, B)]
    if SRp > SR:
        parts.append(jnp.zeros((W, SRp - SR, B), x.dtype))
    return jnp.concatenate(parts, axis=1)


def unpack_state(qp, st):
    W, N = qp.waypoints, qp.n_dim
    Rp = qp.rows_per_waypoint_padded
    B = st.shape[-1]
    x = qp._deinterleave(st[:, : 2 * N])
    z = st[:, 2 * N : 2 * N + Rp].reshape(W * Rp, B)
    y = st[:, 2 * N + Rp : 2 * N + 2 * Rp].reshape(W * Rp, B)
    return x, z, y


def pack_dxdy(qp, dx, dy):
    W, N = qp.waypoints, qp.n_dim
    Rp = qp.rows_per_waypoint_padded
    B = dx.shape[-1]
    DR, DRp = dxdy_rows(qp)
    parts = [qp._interleave(dx), dy.reshape(W, Rp, B)]
    if DRp > DR:
        parts.append(jnp.zeros((W, DRp - DR, B), dx.dtype))
    return jnp.concatenate(parts, axis=1)


def unpack_dxdy(qp, d):
    W, N = qp.waypoints, qp.n_dim
    Rp = qp.rows_per_waypoint_padded
    B = d.shape[-1]
    dx = qp._deinterleave(d[:, : 2 * N])
    dy = d[:, 2 * N : 2 * N + Rp].reshape(W * Rp, B)
    return dx, dy



# ---------------------------------------------------------------------------
# Packed triangular factor
# ---------------------------------------------------------------------------
#
# ``chol`` is lower-triangular and — for the trajectory QP family — ``gain``
# is EXACTLY upper-triangular: the lower coupling block L couples q_{t+1}
# only to (q_t, v_t) on shifted identities and v_{t+1} only to v_t, so L is
# block-upper-triangular within the (2N, 2N) tile, and G = L·C⁻ᵀ (product of
# two upper triangles) stays upper-triangular in exact arithmetic.  Packing
# both to their 2N(2N+1)/2 nonzero entries cuts the factor's HBM traffic to
# 54% and halves the G matvec multiplies.  Pinned by
# tests/test_admm_fused.py::test_gain_is_upper_triangular.


def _tri_maps(B2):
    low = {}
    k = 0
    for i in range(B2):
        for j in range(i + 1):
            low[(i, j)] = k
            k += 1
    up = {}
    k = 0
    for i in range(B2):
        for j in range(i, B2):
            up[(i, j)] = k
            k += 1
    return low, up, _pad8(len(low))


def pack_factor(qp, factor):
    """LaneFactor (full blocks) → (cholp (W, Tp, B), gainp (W, Tp, B))."""
    W, N = qp.waypoints, qp.n_dim
    B2 = 2 * N
    B = factor.chol.shape[-1]
    dt = factor.chol.dtype
    low, up, Tp = _tri_maps(B2)
    low_flat = [i * B2 + j for (i, j) in sorted(low, key=low.get)]
    up_flat = [i * B2 + j for (i, j) in sorted(up, key=up.get)]
    cholp = factor.chol.reshape(W, B2 * B2, B)[:, jnp.asarray(low_flat)]
    gain = jnp.concatenate(
        [factor.gain, jnp.zeros((1,) + factor.gain.shape[1:], dt)], axis=0
    )
    gainp = gain.reshape(W, B2 * B2, B)[:, jnp.asarray(up_flat)]
    pad = Tp - len(low_flat)
    if pad:
        z = jnp.zeros((W, pad, B), dt)
        cholp = jnp.concatenate([cholp, z], axis=1)
        gainp = jnp.concatenate([gainp, z], axis=1)
    return cholp, gainp


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _make_kernel(*, W, N, Rp, CRp, SRp, DRp, S, n_iter, sigma, alpha,
                 row_off, coef_off, ball_rows, ball_coefs, n_obstacles):
    B2 = 2 * N
    X0, Z0, Y0 = 0, B2, B2 + Rp  # row offsets inside the state tile
    LOW, UP, _ = _tri_maps(B2)

    def kernel(
        chol_hbm, gain_hbm, coef_hbm, q_hbm, lu_hbm, rho_hbm, done_vmem,
        state_in,
        state_hbm, dxdy_hbm, w_hbm,  # outputs; state_hbm aliases state_in
        cbuf, gbuf, fbuf, qbuf, lubuf, rbuf, sbuf, dbuf, obuf, wbuf, wrbuf,
        csem, gsem, fsem, qsem, lusem, rsem, ssem, dsem, osem, wsem, wrsem,
    ):
        del state_in  # same memory as state_hbm; use that ref
        sub0 = pl.program_id(0) * S
        zero = jnp.zeros((S, LANE), cbuf.dtype)
        keep = done_vmem[:]  # (S, LANE); 1.0 = frozen problem
        live = 1.0 - keep

        def sel(new, old):
            return keep * old + live * new

        def dma(hbm, buf, sem, slot, t):
            # (t, :, ..., [sub0:sub0+S], :) — mid dims full, batch tile last.
            idx = (t,) + (slice(None),) * (len(hbm.shape) - 3) + (
                pl.ds(sub0, S), slice(None),
            )
            return pltpu.make_async_copy(
                hbm.at[idx], buf.at[slot], sem.at[slot]
            )

        def wdma(buf, hbm, sem, slot, t):
            idx = (t,) + (slice(None),) * (len(hbm.shape) - 3) + (
                pl.ds(sub0, S), slice(None),
            )
            return pltpu.make_async_copy(
                buf.at[slot], hbm.at[idx], sem.at[slot]
            )

        # fwd needs G_{t-1}; the gain stream is fetched UNSHIFTED and read
        # from the previous step's slot (see fwd_body).
        ident = lambda t: t  # noqa: E731
        fwd_streams = (
            (chol_hbm, cbuf, csem, ident),
            (gain_hbm, gbuf, gsem, lambda t: jnp.maximum(t - 1, 0)),
            (coef_hbm, fbuf, fsem, ident),
            (q_hbm, qbuf, qsem, ident),
            (rho_hbm, rbuf, rsem, ident),
            (state_hbm, sbuf, ssem, ident),
        )
        bwd_streams = (
            (chol_hbm, cbuf, csem, ident),
            (gain_hbm, gbuf, gsem, ident),
            (coef_hbm, fbuf, fsem, ident),
            (lu_hbm, lubuf, lusem, ident),
            (rho_hbm, rbuf, rsem, ident),
            (state_hbm, sbuf, ssem, ident),
            (w_hbm, wrbuf, wrsem, ident),
        )

        def start(streams, slot, t):
            for hbm, buf, sem, idx in streams:
                dma(hbm, buf, sem, slot, idx(t)).start()

        def wait(streams, slot, t):
            for hbm, buf, sem, idx in streams:
                dma(hbm, buf, sem, slot, idx(t)).wait()

        def lower_solve(slot, b):
            w = []
            for i in range(B2):
                acc = b[i]
                for j in range(i):
                    acc = acc - cbuf[slot, LOW[(i, j)]] * w[j]
                w.append(acc / cbuf[slot, LOW[(i, i)]])
            return w

        def upper_solve(slot, b):
            x = [None] * B2
            for i in reversed(range(B2)):
                acc = b[i]
                for j in range(i + 1, B2):
                    acc = acc - cbuf[slot, LOW[(j, i)]] * x[j]
                x[i] = acc / cbuf[slot, LOW[(i, i)]]
            return x

        def iteration(it, _):
            last = it == n_iter - 1

            # ===== forward: RHS build + forward substitution ===============
            start(fwd_streams, 0, 0)

            def fwd_body(t, carry):
                w_prev, vdyn_p, vacc_p, c1_p, a0_p = carry
                s = t % 2

                @pl.when(t + 1 < W)
                def _():
                    start(fwd_streams, (t + 1) % 2, t + 1)

                wait(fwd_streams, s, t)

                def vrow(r):
                    return rbuf[s, r] * sbuf[s, Z0 + r] - sbuf[s, Y0 + r]

                vdyn = [vrow(row_off["dyn"] + j) for j in range(N)]
                vacc = [vrow(row_off["acc"] + j) for j in range(N)]

                rhs = []
                for j in range(N):  # q rows of the Aᵀ gather
                    g = fbuf[s, coef_off["c2"] + j] * vdyn[j]
                    g = g + c1_p[j] * vdyn_p[j]
                    g = g + fbuf[s, coef_off["pos"] + j] * vrow(
                        row_off["pos"] + j
                    )
                    for b in range(len(ball_rows)):
                        ws_r, obs_r = ball_rows[b]
                        ws_c, obs_c = ball_coefs[b]
                        if ws_r is not None:
                            for a3 in range(3):
                                g = g + fbuf[s, ws_c + a3 * N + j] * vrow(
                                    ws_r + a3
                                )
                        if obs_r is not None:
                            for o in range(n_obstacles):
                                g = g + fbuf[s, obs_c + o * N + j] * vrow(
                                    obs_r + o
                                )
                    rhs.append(sigma * sbuf[s, X0 + j] - qbuf[s, j] + g)
                for j in range(N):  # v rows
                    g = fbuf[s, coef_off["c0"] + j] * vdyn[j]
                    g = g + fbuf[s, coef_off["vel"] + j] * vrow(
                        row_off["vel"] + j
                    )
                    g = g + fbuf[s, coef_off["a1"] + j] * vacc[j]
                    g = g + a0_p[j] * vacc_p[j]
                    rhs.append(sigma * sbuf[s, X0 + N + j] - qbuf[s, N + j] + g)

                # w_t = C_t⁻¹ (rhs_t − G_{t-1} w_{t-1}); G upper-triangular.
                b_rows = []
                for i in range(B2):
                    acc = zero
                    for j in range(i, B2):
                        acc = acc + gbuf[s, UP[(i, j)]] * w_prev[j]
                    b_rows.append(jnp.where(t > 0, rhs[i] - acc, rhs[i]))
                w = lower_solve(s, b_rows)
                for i in range(B2):
                    wbuf[s, i] = w[i]
                ww = wdma(wbuf, w_hbm, wsem, s, t)
                ww.start()
                ww.wait()

                c1_n = tuple(fbuf[s, coef_off["c1"] + j] for j in range(N))
                a0_n = tuple(fbuf[s, coef_off["a0"] + j] for j in range(N))
                return (tuple(w), tuple(vdyn), tuple(vacc), c1_n, a0_n)

            zN = tuple(zero for _ in range(N))
            jax.lax.fori_loop(
                0, W, fwd_body,
                (tuple(zero for _ in range(B2)), zN, zN, zN, zN),
            )

            # ===== backward: solve + project + dual update =================
            start(bwd_streams, (W - 1) % 2, W - 1)

            def bwd_body(i, xt_next):
                t = W - 1 - i
                s = t % 2

                @pl.when(t > 0)
                def _():
                    start(bwd_streams, (t - 1) % 2, t - 1)

                wait(bwd_streams, s, t)

                # x̃_t = C_t⁻ᵀ (w_t − G_tᵀ x̃_{t+1}); (Gᵀx)_i = Σ_{j≤i} G[j,i]·x_j.
                b_rows = []
                for ii in range(B2):
                    acc = zero
                    for j in range(ii + 1):
                        acc = acc + gbuf[s, UP[(j, ii)]] * xt_next[j]
                    b_rows.append(
                        jnp.where(t < W - 1, wrbuf[s, ii] - acc, wrbuf[s, ii])
                    )
                xt = upper_solve(s, b_rows)

                for ii in range(B2):
                    x_new = alpha * xt[ii] + (1.0 - alpha) * sbuf[s, X0 + ii]
                    obuf[s, X0 + ii] = sel(x_new, sbuf[s, X0 + ii])

                    @pl.when(last)
                    def _():
                        dbuf[s, ii] = live * (x_new - sbuf[s, X0 + ii])

                # A-row apply at waypoint t (x̃_{t+1} still in registers).
                zt = [None] * Rp
                for j in range(N):
                    zt[row_off["dyn"] + j] = (
                        fbuf[s, coef_off["c0"] + j] * xt[N + j]
                        + fbuf[s, coef_off["c1"] + j] * xt_next[j]
                        + fbuf[s, coef_off["c2"] + j] * xt[j]
                    )
                    zt[row_off["pos"] + j] = (
                        fbuf[s, coef_off["pos"] + j] * xt[j]
                    )
                    zt[row_off["vel"] + j] = (
                        fbuf[s, coef_off["vel"] + j] * xt[N + j]
                    )
                    zt[row_off["acc"] + j] = (
                        fbuf[s, coef_off["a0"] + j] * xt_next[N + j]
                        + fbuf[s, coef_off["a1"] + j] * xt[N + j]
                    )
                for b in range(len(ball_rows)):
                    ws_r, obs_r = ball_rows[b]
                    ws_c, obs_c = ball_coefs[b]
                    if ws_r is not None:
                        for a3 in range(3):
                            acc = zero
                            for j in range(N):
                                acc = acc + fbuf[s, ws_c + a3 * N + j] * xt[j]
                            zt[ws_r + a3] = acc
                    if obs_r is not None:
                        for o in range(n_obstacles):
                            acc = zero
                            for j in range(N):
                                acc = acc + fbuf[s, obs_c + o * N + j] * xt[j]
                            zt[obs_r + o] = acc

                for r in range(Rp):
                    ztr = zt[r] if zt[r] is not None else zero
                    z_old = sbuf[s, Z0 + r]
                    y_old = sbuf[s, Y0 + r]
                    z_tmp = alpha * ztr + (1.0 - alpha) * z_old
                    z_new = jnp.clip(
                        z_tmp + y_old / rbuf[s, r],
                        lubuf[s, r], lubuf[s, Rp + r],
                    )
                    y_new = y_old + rbuf[s, r] * (z_tmp - z_new)
                    obuf[s, Z0 + r] = sel(z_new, z_old)
                    obuf[s, Y0 + r] = sel(y_new, y_old)

                    @pl.when(last)
                    def _():
                        dbuf[s, B2 + r] = live * (y_new - y_old)

                for r in range(2 * N + 2 * Rp, SRp):
                    obuf[s, r] = zero

                wr = wdma(obuf, state_hbm, osem, s, t)
                wr.start()
                wr.wait()

                @pl.when(last)
                def _():
                    for r in range(2 * N + Rp, DRp):
                        dbuf[s, r] = zero
                    wd = wdma(dbuf, dxdy_hbm, dsem, s, t)
                    wd.start()
                    wd.wait()

                return tuple(xt)

            jax.lax.fori_loop(0, W, bwd_body, tuple(zero for _ in range(B2)))
            return 0

        jax.lax.fori_loop(0, n_iter, iteration, 0)

    return kernel


# ---------------------------------------------------------------------------
# Host-side call
# ---------------------------------------------------------------------------


def _tile(a, GS):
    """(..., B) → (..., GS, LANE)."""
    return a.reshape(*a.shape[:-1], GS, LANE)


def fused_admm_chunk(
    scaled, factor, x, z, y, rho_vec, done, settings,
    coef=None, lu=None, packed_factor=None, interpret=None,
    return_packed=False, state_pack=None,
):
    """Run ``settings.check_termination`` ADMM iterations fused.

    ``scaled``: waypoint-layout :class:`LaneTrajectoryQP` (Ruiz-scaled);
    ``factor``: its block-Cholesky ``LaneFactor`` (ignored when
    ``packed_factor`` — the :func:`pack_factor` output — is given); flat
    lane state ``x (n, B)``, ``z/y/rho_vec (m, B)``, ``done (B,) bool``.
    Returns ``(x, z, y, dx, dy)``: the state after the chunk plus the final
    iteration's deltas (zero for frozen problems — their certificates are
    already decided), semantically matching ``check_termination``
    applications of :func:`admm_lane._iteration`.

    ``state_pack``: the (W, SRp, B) packed state from a previous chunk call
    — skips :func:`pack_state` on entry AND the flat unpack on exit
    (``x``/``z``/``y`` may be None); returns only
    ``(state_out, dxdy_out)``.  This is how the driver carries state across
    chunks with zero relayouts.
    """
    W, N, B = scaled.waypoints, scaled.n_dim, scaled.batch
    Rp = scaled.rows_per_waypoint_padded
    _, SRp = state_rows(scaled)
    _, DRp = dxdy_rows(scaled)
    row_off, ball_rows = _row_layout(scaled)
    coef_off, ball_coefs, _, CRp = _coef_layout(scaled)
    _, _, Tp = _tri_maps(2 * N)
    dt = scaled.q_vec.dtype
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    GS = B // LANE
    S = min(MAX_SUBLANES, GS)
    grid = GS // S

    if coef is None:
        coef = build_coef_pack(scaled)
    if lu is None:
        lu = build_lu_pack(scaled)
    if packed_factor is None:
        packed_factor = pack_factor(scaled, factor)
    cholp, gainp = packed_factor

    state = state_pack if state_pack is not None else pack_state(scaled, x, z, y)
    q_int = scaled._interleave(scaled.q_vec)  # (W, 2N, B)
    rho3 = rho_vec.reshape(W, Rp, B)
    done_f = done.astype(dt).reshape(GS, LANE)

    kernel = _make_kernel(
        W=W, N=N, Rp=Rp, CRp=CRp, SRp=SRp, DRp=DRp, S=S,
        n_iter=settings.check_termination,
        sigma=float(settings.sigma), alpha=float(settings.alpha),
        row_off=row_off, coef_off=coef_off,
        ball_rows=ball_rows, ball_coefs=ball_coefs,
        n_obstacles=scaled.n_obstacles,
    )

    state_out, dxdy_out, _ = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # cholp
            pl.BlockSpec(memory_space=pl.ANY),  # gainp
            pl.BlockSpec(memory_space=pl.ANY),  # coef
            pl.BlockSpec(memory_space=pl.ANY),  # q
            pl.BlockSpec(memory_space=pl.ANY),  # lu
            pl.BlockSpec(memory_space=pl.ANY),  # rho
            pl.BlockSpec(  # done mask, auto-blocked per program
                (S, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # state (aliased to out 0)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((W, SRp, GS, LANE), dt),
            jax.ShapeDtypeStruct((W, DRp, GS, LANE), dt),
            jax.ShapeDtypeStruct((W, 2 * N, GS, LANE), dt),  # w scratch
        ),
        input_output_aliases={7: 0},
        scratch_shapes=[
            pltpu.VMEM((2, Tp, S, LANE), dt),  # cbuf (packed chol)
            pltpu.VMEM((2, Tp, S, LANE), dt),  # gbuf (packed gain)
            pltpu.VMEM((2, CRp, S, LANE), dt),  # fbuf
            pltpu.VMEM((2, 2 * N, S, LANE), dt),  # qbuf
            pltpu.VMEM((2, 2 * Rp, S, LANE), dt),  # lubuf
            pltpu.VMEM((2, Rp, S, LANE), dt),  # rbuf
            pltpu.VMEM((2, SRp, S, LANE), dt),  # sbuf
            pltpu.VMEM((2, DRp, S, LANE), dt),  # dbuf
            pltpu.VMEM((2, SRp, S, LANE), dt),  # obuf
            pltpu.VMEM((2, 2 * N, S, LANE), dt),  # wbuf (fwd write)
            pltpu.VMEM((2, 2 * N, S, LANE), dt),  # wrbuf (bwd read)
            pltpu.SemaphoreType.DMA((2,)),  # csem
            pltpu.SemaphoreType.DMA((2,)),  # gsem
            pltpu.SemaphoreType.DMA((2,)),  # fsem
            pltpu.SemaphoreType.DMA((2,)),  # qsem
            pltpu.SemaphoreType.DMA((2,)),  # lusem
            pltpu.SemaphoreType.DMA((2,)),  # rsem
            pltpu.SemaphoreType.DMA((2,)),  # ssem
            pltpu.SemaphoreType.DMA((2,)),  # dsem
            pltpu.SemaphoreType.DMA((2,)),  # osem
            pltpu.SemaphoreType.DMA((2,)),  # wsem
            pltpu.SemaphoreType.DMA((2,)),  # wrsem
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        _tile(cholp, GS), _tile(gainp, GS), _tile(coef, GS), _tile(q_int, GS),
        _tile(lu, GS), _tile(rho3, GS), done_f, _tile(state, GS),
    )

    state_out = state_out.reshape(W, SRp, B)
    dxdy_out = dxdy_out.reshape(W, DRp, B)
    if state_pack is not None:
        return state_out, dxdy_out
    x2, z2, y2 = unpack_state(scaled, state_out)
    dx2, dy2 = unpack_dxdy(scaled, dxdy_out)
    if return_packed:
        return x2, z2, y2, dx2, dy2, state_out, dxdy_out
    return x2, z2, y2, dx2, dy2
