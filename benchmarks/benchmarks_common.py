"""Shared problem builders for the benchmark scripts."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def build_batch(batch: int, W: int, N: int, dtype):
    """Batch of feasible GOMP-style box trajectory QPs (deterministic)."""
    from osqp_solver_tpu.gomp.trajectory_qp import (
        empty_trajectory_qp,
        with_gomp_boxes,
    )

    base = empty_trajectory_qp(W, N, gripper_flags=(), n_obstacles=0, dtype=dtype)
    pos = (jnp.full(N, -10.0, dtype), jnp.full(N, 10.0, dtype))
    vel = (jnp.full(N, -1.0, dtype), jnp.full(N, 1.0, dtype))
    acc = (jnp.full(N, -2.0, dtype), jnp.full(N, 2.0, dtype))

    def one(i):
        start = 0.02 * jnp.sin(jnp.arange(N, dtype=dtype) + i)
        end = 1.0 + 0.02 * jnp.cos(jnp.arange(N, dtype=dtype) * 1.3 + i)
        return with_gomp_boxes(base, start, end, pos, vel, acc)

    return jax.vmap(one)(jnp.arange(batch, dtype=dtype))
