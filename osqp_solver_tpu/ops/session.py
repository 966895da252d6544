"""Solver session: setup once, update values, re-solve warm-started.

Functional mirror of the reference's ``QPSolver`` wrapper
(``/root/reference/src/osqp-wrapper.h:12-60``) with OSQP's session semantics:

* ``setup``  — equilibrate once (Ruiz scaling computed here and *frozen*,
  like OSQP's ``Init``);
* ``update`` — replace problem values (A coefficients / bounds / q) keeping
  shapes and the original scaling, mirroring ``UpdateConstraintMatrix`` +
  ``SetBounds`` (``osqp-wrapper.h:33-43``) — OSQP rescales new data with the
  existing D/E/c, and the next solve refactorizes the KKT;
* ``solve``  — run ADMM warm-started from the previous solution (OSQP
  carries x/y/z across ``Solve()`` calls; the reference's explicit
  ``setWarmStart`` is the ``warm_start`` argument of :func:`setup`).

The session is a pytree — it jits, vmaps (batched sessions), and lives on
device across MPC/SCP re-solves (BASELINE config 4: carried state + cached
factorization reuse).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import struct

from . import admm
from .admm import ADMMState, Settings, SolveResult
from .ruiz import Scaling, identity_scaling, ruiz_equilibrate


@struct.dataclass
class Session:
    base: object  # unscaled QP (DenseQP / TrajectoryQP)
    scaled: object  # scaled QP
    scaling: Scaling
    warm_x: jnp.ndarray  # unscaled primal warm start for the next solve
    warm_y: jnp.ndarray  # unscaled dual warm start


def setup(
    qp,
    settings: Settings = Settings(),
    warm_x: Optional[jnp.ndarray] = None,
    warm_y: Optional[jnp.ndarray] = None,
) -> Session:
    """Equilibrate and create a session (mirror of ``OsqpSolver::Init`` +
    ``SetPrimalWarmStart``, ``osqp-wrapper.h:28,45-49``)."""
    n, m = qp.q.shape[-1], qp.l.shape[-1]
    dtype = qp.q.dtype
    if settings.scaling > 0:
        scaled, scaling = ruiz_equilibrate(qp, settings.scaling)
    else:
        scaled, scaling = qp, identity_scaling(n, m, dtype)
    return Session(
        base=qp,
        scaled=scaled,
        scaling=scaling,
        warm_x=jnp.zeros(n, dtype) if warm_x is None else jnp.asarray(warm_x, dtype),
        warm_y=jnp.zeros(m, dtype) if warm_y is None else jnp.asarray(warm_y, dtype),
    )


def update(session: Session, new_qp) -> Session:
    """Values-only problem update with frozen scaling (OSQP
    ``osqp_update_A``/``osqp_update_bounds`` semantics; shapes must be
    unchanged — which the static containers guarantee by construction)."""
    s = session.scaling
    return session.replace(
        base=new_qp, scaled=new_qp.scale_data(s.D, s.E, s.c)
    )


def solve(
    session: Session, settings: Settings = Settings()
) -> Tuple[Session, SolveResult]:
    """Solve warm-started from the session's carried iterates; returns the
    updated session (iterates advanced — OSQP's cross-``Solve()`` warm
    starting) and the result."""
    st = admm.init_state(
        session.scaled,
        settings,
        warm_x=session.warm_x,
        warm_y=session.warm_y,
        scaling=session.scaling,
    )
    st = admm.run_admm(session.base, session.scaled, session.scaling, st, settings)
    result = admm.finalize(session.base, session.scaling, st)
    return session.replace(warm_x=result.x, warm_y=result.y), result
