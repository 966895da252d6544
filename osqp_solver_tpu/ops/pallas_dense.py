"""Pallas TPU kernels: batched dense Cholesky + triangular solves.

The speed-of-light path for the *dense* QP class (``DenseQP`` — BASELINE
config 2, the TPU-native replacement for qdldl's LDLᵀ on problems with no
banded structure, SURVEY.md §2.2).  ``jnp.linalg.cholesky`` /
``solve_triangular`` lower to sequential small-matrix XLA ops that spend
their time on dispatch and relayout, not math (VERDICT r1 weak #6).  Like
:mod:`osqp_solver_tpu.ops.pallas_tridiag`, these kernels flip the layout:
the *problem batch* lives on the 128-wide lane dimension, every matrix
element becomes a lane vector, and the whole factorization / fused
forward+backward substitution runs inside one kernel per 128-problem tile.

Layout: ``M``/``Lt`` are ``(n, n, BATCH)`` ("lane-major": batch last),
``rhs``/``x`` are ``(n, BATCH)``.  The factor is stored **transposed**:
``Lt[j] = column j of L`` (row ``j`` of ``Lᵀ``), which makes both
substitution sweeps row-access-only.

Masked-recurrence discipline (Pallas guide: no dynamic shapes): each
factorization step does a *full* ``(n, n, B)`` rank-1 update with the
eliminated prefix masked to zero, trading the 3× triangular-FLOP saving for
dense VPU throughput — a win for the small n (50–200) of this class.

VMEM budget: one tile needs ``~2·n²·128·4`` bytes (M + Lt); n ≤ ~128 fits
comfortably.  Larger n falls back to the XLA path in the ``custom_vmap``
rules below.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_TILE = 128
# Above this, (n, n, 128) f32 buffers (M workspace + factor ≈ 2·n²·512B)
# no longer fit VMEM alongside the pipeline's double buffers.
MAX_KERNEL_N = 160


def _onehot_reduce(arr, j):
    """Row ``j`` of ``arr`` (n, B) → (B,) without dynamic slicing: masked
    sum over the sublane axis (cheap VPU reduce; avoids relayouts)."""
    n = arr.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    return jnp.sum(jnp.where(iota == j, arr, 0), axis=0)


def _factor_kernel(m_ref, lt_ref):
    """Right-looking lane-vectored Cholesky of one 128-problem tile.

    ``m_ref``: (n, n, T) symmetric input; ``lt_ref``: (n, n, T) output with
    ``lt_ref[j] = column j of L``.
    """
    n = m_ref.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def body(j, M):
        row = jax.lax.dynamic_index_in_dim(M, j, 0, keepdims=False)  # (n, T)
        d = _onehot_reduce(row, j)  # (T,) = S[j, j]
        dinv = jax.lax.rsqrt(d)
        col = row * dinv[None, :]  # L[i, j] for i ≥ j (garbage above)
        col = jnp.where(iota >= j, col, 0.0)
        lt_ref[pl.ds(j, 1)] = col[None]
        # Rank-1 downdate of the trailing block; the strict-lower mask keeps
        # rows/cols ≤ j untouched (they are dead after this step).
        c = jnp.where(iota > j, col, 0.0)
        return M - c[:, None, :] * c[None, :, :]

    jax.lax.fori_loop(0, n, body, m_ref[:], unroll=False)


def _solve_kernel(lt_ref, rhs_ref, x_ref):
    """Fused forward+backward substitution: ``L Lᵀ x = rhs`` for one tile.

    ``lt_ref``: (n, n, T) with rows = columns of L; ``rhs_ref``/``x_ref``:
    (n, T).  The factor is read once from VMEM; both sweeps are masked
    full-width lane ops.
    """
    n = lt_ref.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def fwd(j, b):
        ltrow = jax.lax.dynamic_index_in_dim(lt_ref[:], j, 0, keepdims=False)
        d = _onehot_reduce(ltrow, j)
        zj = _onehot_reduce(b, j) / d
        # axpy: eliminate z_j from the remaining rows, store z_j at row j.
        b = b - zj[None, :] * jnp.where(iota > j, ltrow, 0.0)
        return jnp.where(iota == j, zj[None, :], b)

    z = jax.lax.fori_loop(0, n, fwd, rhs_ref[:], unroll=False)

    def bwd(k, x):
        i = n - 1 - k
        ltrow = jax.lax.dynamic_index_in_dim(lt_ref[:], i, 0, keepdims=False)
        d = _onehot_reduce(ltrow, i)
        # dot-form: x_i = (z_i − Σ_{k>i} Lᵀ[i,k] x_k) / L[i,i]
        s = jnp.sum(jnp.where(iota > i, ltrow, 0.0) * x, axis=0)
        xi = (_onehot_reduce(z, i) - s) / d
        return jnp.where(iota == i, xi[None, :], x)

    x_ref[:] = jax.lax.fori_loop(0, n, bwd, z, unroll=False)


def _pad_lane_major(M, n, B, identity_diag: bool):
    """Pad lanes to a LANE_TILE multiple and sublanes to a multiple of 8.

    Dead lanes get an identity matrix (keeps rsqrt finite); the sublane pad
    extends the diagonal with 1s so padded rows never produce inf/nan.
    """
    lane_pad = (-B) % LANE_TILE
    sub_pad = (-n) % 8
    np_, Bp = n + sub_pad, B + lane_pad
    if lane_pad or sub_pad:
        M = jnp.pad(M, [(0, sub_pad), (0, sub_pad), (0, lane_pad)])
        if identity_diag:
            eye = jnp.eye(np_, dtype=M.dtype)
            if lane_pad:
                M = M.at[:, :, B:].set(eye[:, :, None])
            if sub_pad:
                M = M.at[n:, n:, :B].set(eye[n:, n:, None])
    return M, np_, Bp


def factor_lane_major(M, interpret: bool | None = None):
    """Batched dense Cholesky, lane-major: ``M`` (n, n, B) SPD →
    ``Lt`` (n, n, B) with ``Lt[j] = column j of L`` (``M = L Lᵀ``)."""
    n, _, B = M.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    M, np_, Bp = _pad_lane_major(M, n, B, identity_diag=True)
    out = pl.pallas_call(
        _factor_kernel,
        grid=(Bp // LANE_TILE,),
        in_specs=[
            pl.BlockSpec(
                (np_, np_, LANE_TILE), lambda b: (0, 0, b),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (np_, np_, LANE_TILE), lambda b: (0, 0, b),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((np_, np_, Bp), M.dtype),
        interpret=interpret,
    )(M)
    return out[:n, :n, :B]


def solve_lane_major(Lt, rhs, interpret: bool | None = None):
    """Batched fused ``L Lᵀ x = rhs`` solve, lane-major: ``Lt`` (n, n, B)
    from :func:`factor_lane_major`, ``rhs`` (n, B) → x (n, B)."""
    n, _, B = Lt.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Lt, np_, Bp = _pad_lane_major(Lt, n, B, identity_diag=True)
    sub_pad, lane_pad = np_ - n, Bp - B
    if sub_pad or lane_pad:
        rhs = jnp.pad(rhs, [(0, sub_pad), (0, lane_pad)])
    out = pl.pallas_call(
        _solve_kernel,
        grid=(Bp // LANE_TILE,),
        in_specs=[
            pl.BlockSpec(
                (np_, np_, LANE_TILE), lambda b: (0, 0, b),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (np_, LANE_TILE), lambda b: (0, b), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (np_, LANE_TILE), lambda b: (0, b), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((np_, Bp), Lt.dtype),
        interpret=interpret,
    )(Lt, rhs)
    return out[:n, :B]


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
    sweeps fuse into one Pallas kernel with the factor VMEM-resident."""
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
