"""Pallas TPU kernel: batched block-tridiagonal triangular solves.

The speed-of-light path for the ADMM x̃-update (SURVEY.md §7 stage 4).  The
scan-based solver in :mod:`osqp_solver_tpu.ops.tridiag` expresses the
per-waypoint 12×12 triangular solves as batched small-matrix XLA ops — each
op is far below MXU/VPU tile size, so XLA spends its time on dispatch and
layout, not math.  This kernel flips the layout: the *problem batch* lives on
the 128-wide lane dimension, every block-matrix element becomes a ``(1, T)``
lane vector, and the whole forward+backward recurrence runs inside one kernel
with the factor streamed from HBM through a double-buffered VMEM pipeline
(one ``(B2, B2, T)`` block DMA per waypoint step, overlapped with compute).

Layout: ``chol``/``gain`` are ``(W, B2, B2, BATCH)`` ("lane-major": batch
last), ``rhs``/``x`` are ``(W, B2, BATCH)``.  The factor comes from
:func:`osqp_solver_tpu.ops.tridiag.block_tridiag_factor` (vmapped), i.e.
``M = C Cᵀ`` with diagonal blocks ``chol`` and sub-diagonal ``gain``:

    forward:   w_t = C_t⁻¹ (b_t − G_{t-1} w_{t-1})
    backward:  x_t = C_t⁻ᵀ (w_t − G_tᵀ x_{t+1})
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_TILE = 128


def _lower_solve(c, b):
    """Solve ``C w = b`` with C lower-triangular, everything lane-vectored.

    ``c``: (B2, B2, T) jnp array; ``b``: list of B2 lane rows (1, T)."""
    B2 = c.shape[0]
    w = []
    for i in range(B2):
        acc = b[i]
        for j in range(i):
            acc = acc - c[i, j][None, :] * w[j]
        w.append(acc / c[i, i][None, :])
    return w


def _upper_solve(c, b):
    """Solve ``Cᵀ x = b`` (C lower-triangular)."""
    B2 = c.shape[0]
    x = [None] * B2
    for i in reversed(range(B2)):
        acc = b[i]
        for j in range(i + 1, B2):
            acc = acc - c[j, i][None, :] * x[j]
        x[i] = acc / c[i, i][None, :]
    return x


def _matvec(g, v):
    """rows of ``G @ v`` as lane vectors; ``g`` (B2, B2, T), v list of (1,T)."""
    B2 = g.shape[0]
    return [
        functools.reduce(
            lambda a, b: a + b, [g[i, j][None, :] * v[j] for j in range(B2)]
        )
        for i in range(B2)
    ]


def _matvec_T(g, v):
    """rows of ``Gᵀ @ v``."""
    B2 = g.shape[0]
    return [
        functools.reduce(
            lambda a, b: a + b, [g[j, i][None, :] * v[j] for j in range(B2)]
        )
        for i in range(B2)
    ]


def _rows(ref, t, B2):
    return [ref[t, i][None, :] for i in range(B2)]


def _write_rows(ref, t, rows):
    for i, r in enumerate(rows):
        ref[t, i] = r[0]


def _solve_kernel(chol_hbm, gain_hbm, rhs_ref, x_ref, cbuf, gbuf, csem, gsem):
    """One batch-tile: full forward+backward substitution over the horizon.

    ``chol_hbm``/``gain_hbm`` stay in HBM ((W, B2, B2, T) for this tile);
    per-waypoint blocks are DMA'd into the 2-slot VMEM buffers ``cbuf``/
    ``gbuf`` one step ahead of use.
    """
    W, B2 = rhs_ref.shape[0], rhs_ref.shape[1]
    # chol/gain are whole-array ANY(HBM) refs; slice this program's lane tile.
    lane0 = pl.program_id(0) * LANE_TILE

    def cdma(slot, t):
        return pltpu.make_async_copy(
            chol_hbm.at[t, :, :, pl.ds(lane0, LANE_TILE)],
            cbuf.at[slot],
            csem.at[slot],
        )

    def gdma(slot, t):
        return pltpu.make_async_copy(
            gain_hbm.at[t, :, :, pl.ds(lane0, LANE_TILE)],
            gbuf.at[slot],
            gsem.at[slot],
        )

    # ------------------------------ forward -------------------------------
    cdma(0, 0).start()

    def fwd_body(t, _):
        @pl.when(t + 1 < W)
        def _():
            cdma((t + 1) % 2, t + 1).start()

        cdma(t % 2, t).wait()

        @pl.when(t < W - 1)
        def _():
            gdma(t % 2, t).start()  # G_t, consumed at step t+1

        b = _rows(rhs_ref, t, B2)

        @pl.when(t > 0)
        def _():
            gdma((t - 1) % 2, t - 1).wait()

        c = cbuf[t % 2]
        g = gbuf[(t + 1) % 2]  # slot (t-1) % 2 == (t+1) % 2
        # w_{t-1}; index clamped at t=0 (value unused — masked below).
        w_prev = _rows(x_ref, jnp.maximum(t - 1, 0), B2)
        corr = _matvec(g, w_prev)
        b = [
            jnp.where(t > 0, bi - ci, bi) for bi, ci in zip(b, corr)
        ]
        _write_rows(x_ref, t, _lower_solve(c, b))
        return 0

    jax.lax.fori_loop(0, W, fwd_body, 0)

    # ------------------------------ backward ------------------------------
    cdma((W - 1) % 2, W - 1).start()

    def bwd_body(i, _):
        t = W - 1 - i

        @pl.when(t - 1 >= 0)
        def _():
            cdma((t - 1) % 2, t - 1).start()

        cdma(t % 2, t).wait()

        @pl.when(t - 1 >= 0)
        def _():
            gdma((t - 1) % 2, t - 1).start()  # G_{t-1}, consumed at step t-1

        b = _rows(x_ref, t, B2)  # holds w_t from the forward pass

        @pl.when(t < W - 1)
        def _():
            gdma(t % 2, t).wait()

        c = cbuf[t % 2]
        g = gbuf[t % 2]
        # x_ref[t+1] already holds the final x_{t+1} (computed last step);
        # index clamped at t = W-1 (value unused — masked below).
        corr = _matvec_T(g, _rows(x_ref, jnp.minimum(t + 1, W - 1), B2))
        b = [jnp.where(t < W - 1, bi - ci, bi) for bi, ci in zip(b, corr)]
        _write_rows(x_ref, t, _upper_solve(c, b))
        return 0

    jax.lax.fori_loop(0, W, bwd_body, 0)


def solve_lane_major(chol, gain, rhs, interpret: bool | None = None):
    """Batched solve in lane-major layout.

    ``chol``: (W, B2, B2, B), ``gain``: (W-1, B2, B2, B), ``rhs``: (W, B2, B)
    → x (W, B2, B).  ``B`` is padded to a multiple of 128 lanes; the grid
    runs one program per 128-problem tile.
    """
    W, B2, _, B = chol.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dtype = rhs.dtype

    pad = (-B) % LANE_TILE
    if pad:
        chol, gain, rhs = (
            jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
            for a in (chol, gain, rhs)
        )
        # padded chol lanes are all-zero → divisions produce inf/nan in dead
        # lanes only; make the diagonal 1 to keep them finite.
        eye = jnp.broadcast_to(
            jnp.eye(B2, dtype=dtype)[None, :, :, None], (W, B2, B2, pad)
        )
        chol = chol.at[..., B:].set(eye)
    Bp = B + pad
    # gain padded to W blocks so the kernel can index t = W-1 harmlessly.
    gain_full = jnp.concatenate(
        [gain, jnp.zeros((W - gain.shape[0], B2, B2, Bp), dtype)], axis=0
    )
    # HBM DMA slices must be sublane-aligned (multiple of 8) along the
    # second-to-last dim; pad the streamed factor blocks' column dim.
    sub_pad = (-B2) % 8
    if sub_pad:
        padspec = [(0, 0), (0, 0), (0, sub_pad), (0, 0)]
        chol = jnp.pad(chol, padspec)
        gain_full = jnp.pad(gain_full, padspec)
    B2p = B2 + sub_pad

    grid = (Bp // LANE_TILE,)
    out = pl.pallas_call(
        _solve_kernel,
        grid=grid,
        in_specs=[
            # Whole-array HBM residents; the kernel DMAs per-waypoint,
            # per-lane-tile slices itself (ANY-space blocks cannot be
            # grid-partitioned by BlockSpec).
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (W, B2, LANE_TILE), lambda b: (0, 0, b), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (W, B2, LANE_TILE), lambda b: (0, 0, b), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((W, B2, Bp), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, B2, B2p, LANE_TILE), dtype),
            pltpu.VMEM((2, B2, B2p, LANE_TILE), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(chol, gain_full, rhs)
    return out[..., :B]


def to_lane_major(batched_factor_or_rhs):
    """Move a leading batch axis to the last (lane) axis."""
    return jnp.moveaxis(batched_factor_or_rhs, 0, -1)


def from_lane_major(arr):
    return jnp.moveaxis(arr, -1, 0)


# ---------------------------------------------------------------------------
# Batched block-Cholesky factorization kernel (lane-major).
# ---------------------------------------------------------------------------


def _gain_rows(l, C):
    """G = L C^{-T} row-by-row: G[i,j] = (L[i,j] − Σ_{k<j} G[i,k] C[j,k]) / C[j,j]."""
    B2 = l.shape[0]
    G = [[None] * B2 for _ in range(B2)]
    for i in range(B2):
        for j in range(B2):
            s = l[i, j][None, :]
            for k in range(j):
                s = s - G[i][k] * C[j][k]
            G[i][j] = s / C[j][j]
    return G


def _factor_kernel(diag_hbm, lower_hbm, chol_hbm, gain_hbm, dbuf, lbuf, obuf, gobuf, dsem, lsem, osem, gsem):
    """One batch-tile: the full block-Cholesky recurrence over the horizon.

    Inputs stream HBM→VMEM double-buffered; each step's ``chol``/``gain``
    block is written back synchronously (compute dominates the recurrence;
    write latency is hidden behind the next input DMA).
    """
    W = diag_hbm.shape[0]
    B2 = dbuf.shape[1]
    lane0 = pl.program_id(0) * LANE_TILE

    def ddma(slot, t):
        return pltpu.make_async_copy(
            diag_hbm.at[t, :, :, pl.ds(lane0, LANE_TILE)], dbuf.at[slot], dsem.at[slot]
        )

    def ldma(slot, t):
        return pltpu.make_async_copy(
            lower_hbm.at[t, :, :, pl.ds(lane0, LANE_TILE)], lbuf.at[slot], lsem.at[slot]
        )

    ddma(0, 0).start()

    def body(t, _):
        @pl.when(t + 1 < W)
        def _():
            ddma((t + 1) % 2, t + 1).start()

        @pl.when(t < W - 1)
        def _():
            ldma(t % 2, t).start()  # L_t, consumed at step t+1

        ddma(t % 2, t).wait()

        @pl.when(t > 0)
        def _():
            ldma((t + 1) % 2, t - 1).wait()

        d = dbuf[t % 2]  # (B2, B2p, T)
        # C_prev lives in obuf[(t-1) % 2] == obuf[(t+1) % 2]; its write DMA
        # completed synchronously last step, so reading it here is safe.
        Cp = obuf[(t + 1) % 2]
        l_prev = lbuf[(t + 1) % 2]  # L_{t-1}, streamed last step

        # G_{t-1} = L_{t-1} C_{t-1}^{-T} (garbage at t = 0, masked below).
        Cp_rows = [[Cp[i, j][None, :] for j in range(B2)] for i in range(B2)]
        G = _gain_rows(l_prev, Cp_rows)

        # S_t = D_t − G G ᵀ (no correction at t = 0).
        s_rows = [[None] * B2 for _ in range(B2)]
        for i in range(B2):
            for j in range(i + 1):
                acc = d[i, j][None, :]
                for k in range(B2):
                    acc = acc - G[i][k] * G[j][k]
                s_rows[i][j] = jnp.where(t > 0, acc, d[i, j][None, :])

        # Lane-vectored Cholesky of S_t.
        C = [[None] * B2 for _ in range(B2)]
        for i in range(B2):
            for j in range(i + 1):
                s = s_rows[i][j]
                for k in range(j):
                    s = s - C[i][k] * C[j][k]
                if i == j:
                    C[i][j] = jnp.sqrt(s)
                else:
                    C[i][j] = s / C[j][j]

        # Store C (and G_{t-1}) into the rotating slots and write them out
        # synchronously (slot is reread as C_prev next step).
        zero = jnp.zeros_like(d[0, 0])
        for i in range(B2):
            for j in range(B2):
                obuf[t % 2, i, j] = C[i][j][0] if j <= i else zero
                gobuf[t % 2, i, j] = G[i][j][0]

        cw = pltpu.make_async_copy(
            obuf.at[t % 2],
            chol_hbm.at[t, :, :, pl.ds(lane0, LANE_TILE)],
            osem.at[t % 2],
        )
        cw.start()
        cw.wait()

        @pl.when(t > 0)
        def _():
            gw = pltpu.make_async_copy(
                gobuf.at[t % 2],
                gain_hbm.at[t - 1, :, :, pl.ds(lane0, LANE_TILE)],
                gsem.at[t % 2],
            )
            gw.start()
            gw.wait()

        return 0

    jax.lax.fori_loop(0, W, body, 0)


def factor_lane_major(diag, lower, interpret: bool | None = None):
    """Batched block-Cholesky in lane-major layout.

    ``diag``: (W, B2, B2, B), ``lower``: (W-1, B2, B2, B) →
    ``(chol (W,B2,B2,B), gain (W-1,B2,B2,B))`` matching
    :func:`osqp_solver_tpu.ops.tridiag.block_tridiag_factor`.
    """
    W, B2, _, B = diag.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dtype = diag.dtype

    pad = (-B) % LANE_TILE
    if pad:
        diag, lower = (
            jnp.pad(a, [(0, 0)] * 3 + [(0, pad)]) for a in (diag, lower)
        )
        eye = jnp.broadcast_to(
            jnp.eye(B2, dtype=dtype)[None, :, :, None], (W, B2, B2, pad)
        )
        diag = diag.at[..., B:].set(eye)  # keep dead lanes SPD
    Bp = B + pad
    lower_full = jnp.concatenate(
        [lower, jnp.zeros((W - lower.shape[0], B2, B2, Bp), dtype)], axis=0
    )
    sub_pad = (-B2) % 8
    if sub_pad:
        padspec = [(0, 0), (0, 0), (0, sub_pad), (0, 0)]
        diag = jnp.pad(diag, padspec)
        lower_full = jnp.pad(lower_full, padspec)
    B2p = B2 + sub_pad

    grid = (Bp // LANE_TILE,)
    chol, gain = pl.pallas_call(
        _factor_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((W, B2, B2p, Bp), dtype),
            jax.ShapeDtypeStruct((W, B2, B2p, Bp), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, B2, B2p, LANE_TILE), dtype),
            pltpu.VMEM((2, B2, B2p, LANE_TILE), dtype),
            pltpu.VMEM((2, B2, B2p, LANE_TILE), dtype),
            pltpu.VMEM((2, B2, B2p, LANE_TILE), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(diag, lower_full)
    return chol[:, :, :B2, :B], gain[: W - 1, :, :B2, :B]


# ---------------------------------------------------------------------------
# vmap-transparent entry point: single-problem callers get the scan solver;
# vmapped batches on TPU dispatch to the Pallas kernel in lane-major layout.
# ---------------------------------------------------------------------------

from jax.custom_batching import custom_vmap  # noqa: E402

from .tridiag import BlockTridiagFactor, block_tridiag_solve  # noqa: E402


@custom_vmap
def tridiag_solve(chol, gain, rhs):
    """Solve ``M x = rhs`` given the block-Cholesky factor ``(chol, gain)``.

    Semantically identical to
    :func:`osqp_solver_tpu.ops.tridiag.block_tridiag_solve`; under ``vmap``
    the whole batch is handed to :func:`solve_lane_major` so the ADMM
    x̃-update runs as one fused kernel per 128-problem lane tile.
    """
    return block_tridiag_solve(BlockTridiagFactor(chol, gain), rhs)


@tridiag_solve.def_vmap
def _tridiag_solve_vmap(axis_size, in_batched, chol, gain, rhs):
    cb, gb, rb = in_batched

    def ensure(a, batched):
        return a if batched else jnp.broadcast_to(a[None], (axis_size,) + a.shape)

    chol = ensure(chol, cb)
    gain = ensure(gain, gb)
    rhs = ensure(rhs, rb)
    if jax.default_backend() == "tpu":
        out = solve_lane_major(
            to_lane_major(chol), to_lane_major(gain), to_lane_major(rhs)
        )
        return from_lane_major(out), True
    out = jax.vmap(
        lambda c, g, r: block_tridiag_solve(BlockTridiagFactor(c, g), r)
    )(chol, gain, rhs)
    return out, True


from .tridiag import block_tridiag_factor  # noqa: E402


@custom_vmap
def tridiag_factor(diag, lower):
    """Block-Cholesky factor ``(chol, gain)`` of a block-tridiagonal SPD
    matrix; under ``vmap`` on TPU the whole batch runs as the lane-major
    Pallas kernel (one fused recurrence per 128-problem tile)."""
    f = block_tridiag_factor(diag, lower)
    return f.chol, f.gain


@tridiag_factor.def_vmap
def _tridiag_factor_vmap(axis_size, in_batched, diag, lower):
    db, lb = in_batched

    def ensure(a, batched):
        return a if batched else jnp.broadcast_to(a[None], (axis_size,) + a.shape)

    diag = ensure(diag, db)
    lower = ensure(lower, lb)
    if jax.default_backend() == "tpu":
        chol, gain = factor_lane_major(to_lane_major(diag), to_lane_major(lower))
        return (from_lane_major(chol), from_lane_major(gain)), (True, True)
    f = jax.vmap(block_tridiag_factor)(diag, lower)
    return (f.chol, f.gain), (True, True)
