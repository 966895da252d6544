"""Preconditioned conjugate-gradient KKT solve (indirect method).

The matrix-free alternative to the direct block-Cholesky path (SURVEY.md
§2.2: "CG path on the reduced system for large/irregular problems" — OSQP's
``linsys_solver = indirect`` analogue).  Solves ``(P + σI + Aᵀdiag(ρ)A) x = b``
using only the QP operator protocol's matvecs, so it works for any problem
container (dense, block-banded, or future structures) and scales to horizons
whose factors would not fit memory.  Jacobi (diagonal) preconditioning;
fixed iteration cap with early exit via ``lax.while_loop`` — fully
jit/vmap-compatible.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray
    residual: jnp.ndarray


def kkt_matvec(qp, rho_vec, sigma, x):
    """``(P + σI + Aᵀ diag(ρ) A) x`` through the operator protocol."""
    return qp.P_matvec(x) + sigma * x + qp.AT_matvec(rho_vec * qp.A_matvec(x))


def kkt_diagonal(qp, rho_vec, sigma):
    """Diagonal of the reduced KKT for Jacobi preconditioning, via the
    column-max protocol when an exact diagonal is unavailable.

    Exact for containers exposing ``P_diagonal``/``A_sq_colsum``; otherwise a
    safe SPD surrogate built from column norms.
    """
    n = qp.q.shape[-1]
    if hasattr(qp, "P_diagonal") and hasattr(qp, "A_sq_colsum"):
        return qp.P_diagonal() + sigma + qp.A_sq_colsum(rho_vec)
    # Surrogate: colmax(P) + sigma + colmax(|A|)² · max(ρ) — upper-bound-ish,
    # keeps the preconditioner SPD.
    a_cols = qp.A_col_absmax()
    return qp.P_col_absmax() + sigma + a_cols * a_cols * jnp.max(rho_vec)


def cg_solve(
    qp,
    rho_vec,
    sigma,
    b,
    x0: Optional[jnp.ndarray] = None,
    tol: float = 1e-7,
    max_iter: int = 200,
) -> CGResult:
    """Preconditioned CG on the reduced KKT system."""
    dtype = b.dtype
    n = b.shape[-1]
    diag = kkt_diagonal(qp, rho_vec, sigma)
    Minv = 1.0 / jnp.maximum(diag, 1e-12)

    x = jnp.zeros(n, dtype) if x0 is None else x0
    r = b - kkt_matvec(qp, rho_vec, sigma, x)
    z = Minv * r
    p = z
    rz = jnp.dot(r, z)
    b_norm = jnp.maximum(jnp.linalg.norm(b), 1e-12)

    def cond(state):
        x, r, z, p, rz, k = state
        return (jnp.linalg.norm(r) > tol * b_norm) & (k < max_iter)

    def body(state):
        x, r, z, p, rz, k = state
        Ap = kkt_matvec(qp, rho_vec, sigma, p)
        alpha = rz / jnp.maximum(jnp.dot(p, Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = Minv * r
        rz_new = jnp.dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    x, r, _, _, _, k = jax.lax.while_loop(
        cond, body, (x, r, z, p, rz, jnp.zeros((), jnp.int32))
    )
    return CGResult(x=x, iterations=k, residual=jnp.linalg.norm(r))


# Selected via ``Settings(kkt_method="cg")`` — see ops/admm.py, which routes
# factor/solve through this module when the indirect backend is chosen (the
# "factor" is then just the (ρ, σ) snapshot; no refactorization cost).
