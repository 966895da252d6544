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
