"""Checkpoint / resume for solver state pytrees.

The reference's closest analogue is warm-start threading + trajectory dumps
(SURVEY.md §5 "checkpoint/resume"); here any flax.struct solver state — a
:class:`~osqp_solver_tpu.ops.session.Session`, a batch of them, or a
:class:`SolveResult` — round-trips to a single ``.npz`` file, so long MPC
sweeps and batched planning jobs can resume after preemption.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def save(path: str, pytree) -> None:
    """Save a pytree of arrays to ``path`` (.npz).  Static/aux structure must
    be reconstructible by the caller (pass a template to :func:`load`)."""
    leaves = jax.tree_util.tree_leaves(pytree)
    np.savez(path, *[np.asarray(l) for l in leaves])


def load(path: str, template):
    """Load arrays saved by :func:`save` back into the structure of
    ``template`` (same pytree definition; shapes/dtypes from disk)."""
    data = np.load(path)
    leaves = [data[k] for k in sorted(data.files, key=lambda s: int(s.split("_")[1]))]
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(l) for l in leaves]
    )
