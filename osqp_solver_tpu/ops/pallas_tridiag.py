"""Pallas TPU kernels: batched block-tridiagonal Cholesky + solves.

The speed-of-light path for the ADMM x̃-update (SURVEY.md §7 stage 4).  The
scan-based solver in :mod:`osqp_solver_tpu.ops.tridiag` expresses the
per-waypoint 12×12 triangular solves as batched small-matrix XLA ops — each
op is far below MXU/VPU tile size, so XLA spends its time on dispatch and
layout, not math.  These kernels flip the layout: the *problem batch* fills
a full ``(S, 128)`` sublane×lane tile (up to 1024 problems per grid
program), every block-matrix element ``C[i, j]`` becomes one such tile, and
the whole forward+backward recurrence runs inside one kernel with the
factor streamed from HBM through a double-buffered VMEM pipeline (one
``(B2, B2, S, 128)`` block DMA per waypoint step, overlapped with compute).

Why sublanes matter: the recurrence is sequential in ``W``, so the kernel
is latency-bound.  With batch only on lanes (the round-1 layout), each
block element op touched a ``(1, 128)`` row — 1/8 of the VPU — and a 1024
batch needed 8 *serial* grid programs.  Batch-on-(sublane×lane) pays the
``2W``-step latency once for all 1024 problems at full VPU width
(measured: 0.85 → ~0.2 ms per ADMM iteration at batch 1024, W=100).

Layout: ``chol``/``gain`` are ``(W, B2, B2, BATCH)`` ("lane-major": batch
last) at the API; internally the batch is reshaped to ``(GS, 128)`` and
grid programs cover ``S`` sublane groups each.  The factor comes from
:func:`osqp_solver_tpu.ops.tridiag.block_tridiag_factor` (vmapped), i.e.
``M = C Cᵀ`` with diagonal blocks ``chol`` and sub-diagonal ``gain``:

    forward:   w_t = C_t⁻¹ (b_t − G_{t-1} w_{t-1})
    backward:  x_t = C_t⁻ᵀ (w_t − G_tᵀ x_{t+1})
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
MAX_SUBLANES = 8  # f32 tile height; one grid program covers S*128 problems


def _batch_tiles(B: int):
    """(padded batch, sublane-groups per program, grid size)."""
    gs = -(-B // LANE)  # ceil
    S = min(MAX_SUBLANES, gs)
    grid = -(-gs // S)
    return grid * S * LANE, S, grid


def _lower_solve(c, b):
    """Solve ``C w = b`` with C lower-triangular; ``c``: (B2, B2, S, T),
    ``b``: list of B2 batch tiles (S, T)."""
    B2 = c.shape[0]
    w = []
    for i in range(B2):
        acc = b[i]
        for j in range(i):
            acc = acc - c[i, j] * w[j]
        w.append(acc / c[i, i])
    return w


def _upper_solve(c, b):
    """Solve ``Cᵀ x = b`` (C lower-triangular)."""
    B2 = c.shape[0]
    x = [None] * B2
    for i in reversed(range(B2)):
        acc = b[i]
        for j in range(i + 1, B2):
            acc = acc - c[j, i] * x[j]
        x[i] = acc / c[i, i]
    return x


def _matvec(g, v):
    """rows of ``G @ v`` as batch tiles; ``g`` (B2, B2, S, T), v list of (S, T)."""
    B2 = g.shape[0]
    return [
        functools.reduce(
            lambda a, b: a + b, [g[i, j] * v[j] for j in range(B2)]
        )
        for i in range(B2)
    ]


def _matvec_T(g, v):
    """rows of ``Gᵀ @ v``."""
    B2 = g.shape[0]
    return [
        functools.reduce(
            lambda a, b: a + b, [g[j, i] * v[j] for j in range(B2)]
        )
        for i in range(B2)
    ]


def _solve_kernel(
    chol_hbm, gain_hbm, rhs_hbm, x_hbm,
    cbuf, gbuf, rbuf, obuf, csem, gsem, rsem, osem,
):
    """One batch-tile program: full forward+backward substitution.

    Everything streams HBM→VMEM→HBM: per waypoint the factor blocks and the
    rhs row are DMA'd into 2-slot buffers one step ahead of use, the w/x
    recurrence values live in registers (loop carries), and each computed
    row is written back synchronously.  No dynamically-indexed VMEM block
    refs anywhere — that pattern (the round-1 kernel) made Mosaic's layout
    pass intractable (>100 s compiles); this streaming form compiles in
    seconds and is what the factorization kernel already does.
    """
    W = chol_hbm.shape[0]
    B2, S = cbuf.shape[1], cbuf.shape[3]
    sub0 = pl.program_id(0) * S
    zero = jnp.zeros(cbuf.shape[-2:], cbuf.dtype)

    def cdma(slot, t):
        return pltpu.make_async_copy(
            chol_hbm.at[t, :, :, pl.ds(sub0, S), :], cbuf.at[slot], csem.at[slot]
        )

    def gdma(slot, t):
        return pltpu.make_async_copy(
            gain_hbm.at[t, :, :, pl.ds(sub0, S), :], gbuf.at[slot], gsem.at[slot]
        )

    def rdma(slot, t):
        return pltpu.make_async_copy(
            rhs_hbm.at[t, :, pl.ds(sub0, S), :], rbuf.at[slot], rsem.at[slot]
        )

    def write_out(slot, t, rows):
        for i, r in enumerate(rows):
            obuf[slot, i] = r
        w = pltpu.make_async_copy(
            obuf.at[slot], x_hbm.at[t, :, pl.ds(sub0, S), :], osem.at[slot]
        )
        w.start()
        w.wait()

    # ------------------------------ forward -------------------------------
    cdma(0, 0).start()
    rdma(0, 0).start()

    def fwd_body(t, w_prev):
        @pl.when(t + 1 < W)
        def _():
            cdma((t + 1) % 2, t + 1).start()
            rdma((t + 1) % 2, t + 1).start()

        @pl.when(t < W - 1)
        def _():
            gdma(t % 2, t).start()  # G_t, consumed at step t+1

        cdma(t % 2, t).wait()
        rdma(t % 2, t).wait()

        @pl.when(t > 0)
        def _():
            gdma((t - 1) % 2, t - 1).wait()

        c = cbuf[t % 2]
        g = gbuf[(t + 1) % 2]  # slot (t-1) % 2 == (t+1) % 2
        b = [rbuf[t % 2, i] for i in range(B2)]
        corr = _matvec(g, list(w_prev))
        b = [jnp.where(t > 0, bi - ci, bi) for bi, ci in zip(b, corr)]
        w = _lower_solve(c, b)
        write_out(t % 2, t, w)
        return tuple(w)

    jax.lax.fori_loop(0, W, fwd_body, tuple(zero for _ in range(B2)))

    # ------------------------------ backward ------------------------------
    cdma((W - 1) % 2, W - 1).start()
    # w_{W-1} row, written back above, streams back in through rbuf.
    wdma = lambda slot, t: pltpu.make_async_copy(  # noqa: E731
        x_hbm.at[t, :, pl.ds(sub0, S), :], rbuf.at[slot], rsem.at[slot]
    )
    wdma((W - 1) % 2, W - 1).start()

    def bwd_body(i, x_next):
        t = W - 1 - i

        @pl.when(t - 1 >= 0)
        def _():
            cdma((t - 1) % 2, t - 1).start()
            wdma((t - 1) % 2, t - 1).start()
            gdma((t - 1) % 2, t - 1).start()  # G_{t-1}, consumed at step t-1

        cdma(t % 2, t).wait()
        wdma(t % 2, t).wait()  # w_t row

        @pl.when(t < W - 1)
        def _():
            gdma(t % 2, t).wait()

        c = cbuf[t % 2]
        g = gbuf[t % 2]
        b = [rbuf[t % 2, i] for i in range(B2)]
        corr = _matvec_T(g, list(x_next))
        b = [jnp.where(t < W - 1, bi - ci, bi) for bi, ci in zip(b, corr)]
        x = _upper_solve(c, b)
        write_out(t % 2, t, x)
        return tuple(x)

    jax.lax.fori_loop(0, W, bwd_body, tuple(zero for _ in range(B2)))


def _to_tiles(a, B, Bp):
    """(..., B) → (..., GS, 128) with zero padding."""
    if Bp != B:
        a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, Bp - B)])
    return a.reshape(*a.shape[:-1], Bp // LANE, LANE)


def solve_lane_major(chol, gain, rhs, interpret: bool | None = None):
    """Batched solve in lane-major layout.

    ``chol``: (W, B2, B2, B), ``gain``: (W-1, B2, B2, B), ``rhs``: (W, B2, B)
    → x (W, B2, B).  The batch is tiled ``(S, 128)`` per grid program
    (S ≤ 8 sublane groups), so up to 1024 problems share one program's
    sequential W-loop at full VPU width.
    """
    W, B2, _, B = chol.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dtype = rhs.dtype

    Bp, S, grid = _batch_tiles(B)
    if Bp != B:
        # dead problems: identity diagonal keeps divisions finite.
        eye = jnp.broadcast_to(
            jnp.eye(B2, dtype=dtype)[None, :, :, None], (W, B2, B2, Bp - B)
        )
        chol = jnp.concatenate([chol, eye], axis=-1)
    chol = chol.reshape(W, B2, B2, Bp // LANE, LANE)
    gain_full = jnp.concatenate(
        [gain, jnp.zeros((W - gain.shape[0],) + gain.shape[1:], dtype)], axis=0
    )
    gain_full = _to_tiles(gain_full, B, Bp)
    rhs = _to_tiles(rhs, B, Bp)

    out = pl.pallas_call(
        _solve_kernel,
        grid=(grid,),
        in_specs=[
            # Whole-array HBM residents; the kernel DMAs per-waypoint,
            # per-batch-tile slices itself.
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((W, B2, Bp // LANE, LANE), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, B2, B2, S, LANE), dtype),
            pltpu.VMEM((2, B2, B2, S, LANE), dtype),
            pltpu.VMEM((2, B2, S, LANE), dtype),
            pltpu.VMEM((2, B2, S, LANE), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(chol, gain_full, rhs)
    return out.reshape(W, B2, Bp)[..., :B]


def to_lane_major(batched_factor_or_rhs):
    """Move a leading batch axis to the last (lane) axis."""
    return jnp.moveaxis(batched_factor_or_rhs, 0, -1)


def from_lane_major(arr):
    return jnp.moveaxis(arr, -1, 0)


# ---------------------------------------------------------------------------
# Batched block-Cholesky factorization kernel (batch-tiled).
# ---------------------------------------------------------------------------


def _gain_rows(l, C):
    """G = L C^{-T} row-by-row: G[i,j] = (L[i,j] − Σ_{k<j} G[i,k] C[j,k]) / C[j,j]."""
    B2 = l.shape[0]
    G = [[None] * B2 for _ in range(B2)]
    for i in range(B2):
        for j in range(B2):
            s = l[i, j]
            for k in range(j):
                s = s - G[i][k] * C[j][k]
            G[i][j] = s / C[j][j]
    return G


def _factor_kernel(
    diag_hbm, lower_hbm, chol_hbm, gain_hbm,
    dbuf, lbuf, obuf, gobuf, dsem, lsem, osem, gsem,
):
    """One batch-tile program: the full block-Cholesky recurrence.

    Inputs stream HBM→VMEM double-buffered; each step's ``chol``/``gain``
    block is written back synchronously (compute dominates the recurrence;
    write latency is hidden behind the next input DMA).
    """
    W = diag_hbm.shape[0]
    B2, S = dbuf.shape[1], dbuf.shape[3]
    sub0 = pl.program_id(0) * S

    def ddma(slot, t):
        return pltpu.make_async_copy(
            diag_hbm.at[t, :, :, pl.ds(sub0, S), :], dbuf.at[slot], dsem.at[slot]
        )

    def ldma(slot, t):
        return pltpu.make_async_copy(
            lower_hbm.at[t, :, :, pl.ds(sub0, S), :], lbuf.at[slot], lsem.at[slot]
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

        d = dbuf[t % 2]  # (B2, B2, S, T)
        # C_prev lives in obuf[(t-1) % 2] == obuf[(t+1) % 2]; its write DMA
        # completed synchronously last step, so reading it here is safe.
        Cp = obuf[(t + 1) % 2]
        l_prev = lbuf[(t + 1) % 2]  # L_{t-1}, streamed last step

        # G_{t-1} = L_{t-1} C_{t-1}^{-T} (garbage at t = 0, masked below).
        Cp_rows = [[Cp[i, j] for j in range(B2)] for i in range(B2)]
        G = _gain_rows(l_prev, Cp_rows)

        # S_t = D_t − G G ᵀ (no correction at t = 0).
        s_rows = [[None] * B2 for _ in range(B2)]
        for i in range(B2):
            for j in range(i + 1):
                acc = d[i, j]
                for k in range(B2):
                    acc = acc - G[i][k] * G[j][k]
                s_rows[i][j] = jnp.where(t > 0, acc, d[i, j])

        # Batch-tiled Cholesky of S_t.
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
                obuf[t % 2, i, j] = C[i][j] if j <= i else zero
                gobuf[t % 2, i, j] = G[i][j]

        cw = pltpu.make_async_copy(
            obuf.at[t % 2],
            chol_hbm.at[t, :, :, pl.ds(sub0, S), :],
            osem.at[t % 2],
        )
        cw.start()
        cw.wait()

        @pl.when(t > 0)
        def _():
            gw = pltpu.make_async_copy(
                gobuf.at[t % 2],
                gain_hbm.at[t - 1, :, :, pl.ds(sub0, S), :],
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

    Bp, S, grid = _batch_tiles(B)
    if Bp != B:
        eye = jnp.broadcast_to(
            jnp.eye(B2, dtype=dtype)[None, :, :, None], (W, B2, B2, Bp - B)
        )
        diag = jnp.concatenate([diag, eye], axis=-1)  # keep dead lanes SPD
    diag = diag.reshape(W, B2, B2, Bp // LANE, LANE)
    lower_full = jnp.concatenate(
        [lower, jnp.zeros((W - lower.shape[0],) + lower.shape[1:], dtype)],
        axis=0,
    )
    lower_full = _to_tiles(lower_full, B, Bp)

    chol, gain = pl.pallas_call(
        _factor_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((W, B2, B2, Bp // LANE, LANE), dtype),
            jax.ShapeDtypeStruct((W, B2, B2, Bp // LANE, LANE), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, B2, B2, S, LANE), dtype),
            pltpu.VMEM((2, B2, B2, S, LANE), dtype),
            pltpu.VMEM((2, B2, B2, S, LANE), dtype),
            pltpu.VMEM((2, B2, B2, S, LANE), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(diag, lower_full)
    chol = chol.reshape(W, B2, B2, Bp)[..., :B]
    gain = gain.reshape(W, B2, B2, Bp)[: W - 1, ..., :B]
    return chol, gain


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
    x̃-update runs as one fused kernel per batch tile.
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
    matrix; under ``vmap`` on TPU the whole batch runs as the batch-tiled
    Pallas kernel (one fused recurrence per ≤1024-problem tile)."""
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
