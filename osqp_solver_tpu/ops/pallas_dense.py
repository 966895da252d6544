"""Pallas TPU kernels: batched dense Cholesky + triangular solves.

The speed-of-light path for the *dense* QP class (``DenseQP`` — BASELINE
config 2, the TPU-native replacement for qdldl's LDLᵀ on problems with no
banded structure, SURVEY.md §2.2).  ``jnp.linalg.cholesky`` /
``solve_triangular`` lower to sequential small-matrix XLA ops that spend
their time on dispatch and relayout, not math (VERDICT r1 weak #6).  These
kernels flip the layout: the problem batch lives on the lane (and, for the
solves, sublane) dimension, and the factorization / substitution loops are
*statically unrolled* over the (small, 50–200) matrix dimension with
constant masks — Mosaic has no dynamic_slice, and static unrolling also
gives full-width VPU ops at every step.

Layouts
-------
* factorization: ``M``/``Lt`` are ``(n, n, B)`` lane-major, one 128-lane
  tile per grid program (the factorization is compute-bound; grid
  serialization is fine).  ``Lt[j] = column j of L`` (row ``j`` of ``Lᵀ``).
* solves: batch-tiled ``(S ≤ 8, 128)`` like
  :mod:`osqp_solver_tpu.ops.pallas_tridiag` — the two substitution sweeps
  are latency-bound, so up to 1024 problems share one sequential pass with
  the factor's rows streamed HBM→VMEM double-buffered.

VMEM budget: factorization needs ``~3·n²·128·4`` bytes per tile; n ≤ ~160
fits.  Larger n falls back to the XLA path in the ``custom_vmap`` rules.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
MAX_SUBLANES = 8
# Above this, the factorization tile (M value + Lt output + masks) no longer
# fits VMEM, and the unrolled program gets large.
MAX_KERNEL_N = 160


def _factor_kernel(m_ref, lt_ref):
    """Right-looking Cholesky of one 128-lane tile, statically unrolled.

    ``m_ref``: (n, n, T) symmetric input; ``lt_ref``: (n, n, T) output with
    ``lt_ref[j] = column j of L``.  Per step: one (n, T) row scale + one
    full (n, n, T) masked rank-1 downdate (constant masks — the strict-lower
    zeroing keeps eliminated rows/cols untouched).
    """
    n = m_ref.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    M = m_ref[:]
    for j in range(n):
        # exact sqrt + divide — Mosaic's rsqrt is the approximate VPU op,
        # whose ~1e-3 relative error compounds across the n rank-1 updates.
        d = jnp.sqrt(M[j, j])  # (T,)
        col = M[j] / d[None, :]  # (n, T): L[i, j] for i ≥ j
        lt_ref[j] = jnp.where(iota >= j, col, 0.0)
        c = jnp.where(iota > j, col, 0.0)
        M = M - c[:, None, :] * c[None, :, :]


def _solve_kernel(lt_hbm, rhs_ref, x_ref, lbuf, lsem):
    """Fused forward+backward substitution for one (S, 128) batch tile.

    Both sweeps are axpy-form with constant masks: forward streams rows of
    ``Lt`` (= columns of L) in order, backward streams them in reverse (a
    row of ``Lt`` is a column of ``Lᵀ``).  The factor is read from HBM
    twice per call through a 2-slot pipeline; the rhs/solution lives in
    VMEM as the (n, S, T) loop value.
    """
    n, S = rhs_ref.shape[0], rhs_ref.shape[1]
    sub0 = pl.program_id(0) * S

    def ldma(slot, j):
        return pltpu.make_async_copy(
            lt_hbm.at[j, :, pl.ds(sub0, S), :], lbuf.at[slot], lsem.at[slot]
        )

    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)

    # ------------------------------ forward: L z = b ----------------------
    ldma(0, 0).start()
    b = rhs_ref[:]
    for j in range(n):
        if j + 1 < n:
            ldma((j + 1) % 2, j + 1).start()
        ldma(j % 2, j).wait()
        ltj = lbuf[j % 2]  # (n, S, T) = column j of L
        zj = b[j] / ltj[j]  # (S, T)
        b = jnp.where(iota == j, zj[None], b - zj[None] * jnp.where(iota > j, ltj, 0.0))

    # ------------------------------ backward: Lᵀ x = z --------------------
    # Row k of Lᵀ is exactly Lt[k] ((Lᵀ)[k,m] = L[m,k]), so each step is a
    # masked dot against the already-final x entries (rows > k of ``b``).
    ldma((n - 1) % 2, n - 1).start()
    for k in range(n - 1, -1, -1):
        if k - 1 >= 0:
            ldma((k - 1) % 2, k - 1).start()
        ldma(k % 2, k).wait()
        ltk = lbuf[k % 2]
        s = jnp.sum(jnp.where(iota > k, ltk * b, 0.0), axis=0)  # (S, T)
        xk = (b[k] - s) / ltk[k]
        b = jnp.where(iota == k, xk[None], b)

    x_ref[:] = b


def factor_lane_major(M, interpret: bool | None = None):
    """Batched dense Cholesky, lane-major: ``M`` (n, n, B) SPD →
    ``Lt`` (n, n, B) with ``Lt[j] = column j of L`` (``M = L Lᵀ``)."""
    n, _, B = M.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    pad = (-B) % LANE
    if pad:
        M = jnp.pad(M, [(0, 0), (0, 0), (0, pad)])
        M = M.at[:, :, B:].set(jnp.eye(n, dtype=M.dtype)[:, :, None])
    Bp = B + pad
    out = pl.pallas_call(
        _factor_kernel,
        grid=(Bp // LANE,),
        in_specs=[
            pl.BlockSpec((n, n, LANE), lambda b: (0, 0, b), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (n, n, LANE), lambda b: (0, 0, b), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, n, Bp), M.dtype),
        interpret=interpret,
    )(M)
    return out[:, :, :B]


def solve_lane_major(Lt, rhs, interpret: bool | None = None):
    """Batched fused ``L Lᵀ x = rhs`` solve, lane-major: ``Lt`` (n, n, B)
    from :func:`factor_lane_major`, ``rhs`` (n, B) → x (n, B)."""
    n, _, B = Lt.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dtype = rhs.dtype
    gs = -(-B // LANE)
    S = min(MAX_SUBLANES, gs)
    grid = -(-gs // S)
    Bp = grid * S * LANE
    if Bp != B:
        Lt = jnp.pad(Lt, [(0, 0), (0, 0), (0, Bp - B)])
        Lt = Lt.at[:, :, B:].set(jnp.eye(n, dtype=dtype)[:, :, None])
        rhs = jnp.pad(rhs, [(0, 0), (0, Bp - B)])
    Lt = Lt.reshape(n, n, Bp // LANE, LANE)
    rhs = rhs.reshape(n, Bp // LANE, LANE)
    out = pl.pallas_call(
        _solve_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (n, S, LANE), lambda g: (0, g, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (n, S, LANE), lambda g: (0, g, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, Bp // LANE, LANE), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, n, S, LANE), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(Lt, rhs)
    return out.reshape(n, Bp)[:, :B]


# ---------------------------------------------------------------------------
# vmap-transparent entry points (same discipline as pallas_tridiag):
# single-problem callers get the XLA path; vmapped batches on TPU dispatch to
# the lane-major kernels.
# ---------------------------------------------------------------------------

from jax.custom_batching import custom_vmap  # noqa: E402


def _xla_cholesky(M):
    return jnp.linalg.cholesky(M)


def _xla_chol_solve(L, rhs):
    z = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
    return jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), z, lower=False
    )


@custom_vmap
def dense_cholesky(M):
    """``jnp.linalg.cholesky`` semantics; under ``vmap`` on TPU (n ≤
    ``MAX_KERNEL_N``) the whole batch runs as one lane-major Pallas kernel
    per 128-problem tile."""
    return _xla_cholesky(M)


@dense_cholesky.def_vmap
def _dense_cholesky_vmap(axis_size, in_batched, M):
    (mb,) = in_batched
    if not mb:
        M = jnp.broadcast_to(M[None], (axis_size,) + M.shape)
    n = M.shape[-1]
    if jax.default_backend() == "tpu" and n <= MAX_KERNEL_N:
        Lt = factor_lane_major(jnp.moveaxis(M, 0, -1))
        # Lt rows are columns of L → transpose back to standard L.
        return jnp.moveaxis(Lt, -1, 0).swapaxes(-1, -2), True
    return _xla_cholesky(M), True


@custom_vmap
def dense_chol_solve(L, rhs):
    """Solve ``L Lᵀ x = rhs``; under ``vmap`` on TPU both substitution
    sweeps fuse into one Pallas kernel with the factor streamed row-wise."""
    return _xla_chol_solve(L, rhs)


@dense_chol_solve.def_vmap
def _dense_chol_solve_vmap(axis_size, in_batched, L, rhs):
    lb, rb = in_batched

    def ensure(a, batched):
        return a if batched else jnp.broadcast_to(a[None], (axis_size,) + a.shape)

    L = ensure(L, lb)
    rhs = ensure(rhs, rb)
    n = L.shape[-1]
    if jax.default_backend() == "tpu" and n <= MAX_KERNEL_N:
        Lt = jnp.moveaxis(L.swapaxes(-1, -2), 0, -1)
        out = solve_lane_major(Lt, jnp.moveaxis(rhs, 0, -1))
        return jnp.moveaxis(out, -1, 0), True
    return _xla_chol_solve(L, rhs), True
