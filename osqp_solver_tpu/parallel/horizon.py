"""Long-horizon trajectory QPs with chunk-partitioned KKT solves.

BASELINE config 5: a single 10k-step trajectory QP whose banded KKT system is
partitioned along the horizon (SURVEY.md §5 "sequence parallelism").  The
ADMM loop itself is cheap at these sizes (vector ops are O(n)); the KKT
factor/solve dominates, so this container swaps the sequential scan solver
for the Schur-complement chunked factorization in
:mod:`osqp_solver_tpu.parallel.schur`:

* ``kkt_factor``  → per-chunk interior block-Cholesky (vmapped over the
  chunk axis — data-parallel across chunks) + the factored (K-1)-separator
  reduced system, cached across ADMM iterations;
* ``kkt_solve``   → chunk-local substitution + tiny reduced solve.

On a real mesh, placing the chunk axis on devices via
``jax.sharding.NamedSharding`` (or the explicit ``shard_map`` path
``schur.schur_solve_sharded``) distributes the interior work; the math here
is bit-identical to the sharded kernels by construction (tests pin this).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..gomp.trajectory_qp import TrajectoryQP
from .schur import schur_factor, schur_solve_cached


@struct.dataclass
class ChunkedTrajectoryQP(TrajectoryQP):
    """TrajectoryQP whose reduced KKT is factored/solved in ``n_chunks``
    horizon chunks (Schur complement) instead of one sequential scan."""

    n_chunks: int = struct.field(pytree_node=False, default=2)

    def kkt_factor(self, rho_vec, sigma):
        diag, lower = self.kkt_blocks(rho_vec, sigma)
        return schur_factor(diag, lower, self.n_chunks)

    def kkt_solve(self, factor, rhs):
        s = schur_solve_cached(factor, self._interleave(rhs))
        return self._deinterleave(s)


def as_chunked(qp: TrajectoryQP, n_chunks: int) -> ChunkedTrajectoryQP:
    """Re-wrap a :class:`TrajectoryQP` for chunk-partitioned KKT solves."""
    fields = {
        name: getattr(qp, name)
        for name in TrajectoryQP.__dataclass_fields__  # noqa: SLF001
    }
    return ChunkedTrajectoryQP(n_chunks=int(n_chunks), **fields)


# ---------------------------------------------------------------------------
# Fully distributed ADMM: KKT factor/solve sharded over the mesh horizon axis
# ---------------------------------------------------------------------------

import jax  # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402

from ..ops import admm as admm_mod  # noqa: E402
from ..ops.tridiag import block_tridiag_factor, block_tridiag_solve  # noqa: E402
from .mesh import HORIZON_AXIS  # noqa: E402
from .schur import (  # noqa: E402
    _chunk_factor,
    merge_solution,
    partition_blocks,
    partition_rhs,
)


@struct.dataclass
class HorizonShardedTrajectoryQP(TrajectoryQP):
    """TrajectoryQP whose KKT factor/solve runs *inside* ``shard_map`` over a
    mesh horizon axis: each device factors its own chunk interior and does
    its own substitutions; only the tiny separator system is exchanged
    (one ``all_gather`` per factor and two per solve).

    The problem data itself is replicated (vectors are O(W·N) — small even
    at 10k waypoints); what is distributed is the O(W·(2N)³) factor/solve
    *compute*, which dominates long-horizon ADMM (BASELINE config 5).

    Must be used inside ``shard_map`` (see :func:`solve_horizon_sharded`).
    """

    n_chunks: int = struct.field(pytree_node=False, default=2)
    axis: str = struct.field(pytree_node=False, default=HORIZON_AXIS)

    def kkt_factor(self, rho_vec, sigma):
        K = self.n_chunks
        diag, lower = self.kkt_blocks(rho_vec, sigma)
        ch = partition_blocks(diag, lower, K)
        k = jax.lax.axis_index(self.axis)
        Di = ch.Di[k]
        Li = ch.Li[k]
        Lleft = ch.Lleft[k]
        Lright = ch.Lright[k]
        interior, U, V, C_right, C_left, C_off = _chunk_factor(
            Di, Li, Lleft, Lright
        )
        gather = lambda v: jax.lax.all_gather(v, self.axis)
        C_right_all = gather(C_right)
        C_left_all = gather(C_left)
        C_off_all = gather(C_off)
        Sdiag = ch.sepD[: K - 1] - C_right_all[: K - 1] - C_left_all[1:K]
        Slower = -jnp.swapaxes(C_off_all[1 : K - 1], -1, -2)
        reduced = block_tridiag_factor(Sdiag, Slower)
        return dict(
            interior=interior, U=U, V=V, Lleft=Lleft, Lright=Lright,
            reduced=reduced, k=k,
        )

    def kkt_solve(self, f, rhs):
        K = self.n_chunks
        s = self._interleave(rhs)
        bi, bs = partition_rhs(s, K)
        k = f["k"]
        w = block_tridiag_solve(f["interior"], bi[k])  # (Wl, B) local
        r_right = f["Lleft"] @ w[-1]
        r_left = f["Lright"].T @ w[0]
        gather = lambda v: jax.lax.all_gather(v, self.axis)
        r_right_all = gather(r_right)
        r_left_all = gather(r_left)
        rS = bs[: K - 1] - r_right_all[: K - 1] - r_left_all[1:K]
        xs = block_tridiag_solve(f["reduced"], rS)  # replicated tiny solve

        B = w.shape[-1]
        zero = jnp.zeros((B,), w.dtype)
        x_right = jnp.where(k < K - 1, xs[jnp.minimum(k, K - 2)], zero)
        x_left = jnp.where(k > 0, xs[jnp.maximum(k - 1, 0)], zero)
        xi = (
            w
            - jnp.einsum("wbr,r->wb", f["U"], x_right)
            - jnp.einsum("wbr,r->wb", f["V"], x_left)
        )
        xi_all = gather(xi)  # (K, Wl, B) — full interior, replicated
        full = merge_solution(xi_all, xs, s.shape[0])
        return self._deinterleave(full)


def as_horizon_sharded(
    qp: TrajectoryQP, n_chunks: int, axis: str = HORIZON_AXIS
) -> HorizonShardedTrajectoryQP:
    fields = {
        name: getattr(qp, name)
        for name in TrajectoryQP.__dataclass_fields__  # noqa: SLF001
    }
    return HorizonShardedTrajectoryQP(
        n_chunks=int(n_chunks), axis=axis, **fields
    )


def solve_horizon_sharded(
    qp: TrajectoryQP,
    mesh: Mesh,
    settings: admm_mod.Settings = admm_mod.Settings(),
    warm_x=None,
    axis: str = HORIZON_AXIS,
) -> admm_mod.SolveResult:
    """Run the full OSQP-semantics ADMM for ONE long-horizon trajectory QP
    with the KKT factor/solve distributed over ``mesh[axis]``.

    Every device carries the (small) replicated vector state and 1/K of the
    factorization/substitution work; per ADMM iteration the only
    communication is the separator exchange (a few ``(K, 2N)``-sized
    ``all_gather``s over ICI).  This is the SURVEY.md §5 "sequence parallel"
    configuration run end-to-end, not just the linear solve.
    """
    K = mesh.shape[axis]
    sq = as_horizon_sharded(qp, K, axis)
    if warm_x is None:
        warm_x = jnp.zeros(sq.n, sq.q.dtype)

    def device_fn(sq_rep, warm):
        return admm_mod.solve(sq_rep, settings, warm_x=warm)

    fn = jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)(sq, jnp.asarray(warm_x, sq.q.dtype))
