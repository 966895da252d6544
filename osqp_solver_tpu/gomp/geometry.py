"""Obstacle geometry: infinite horizontal line obstacles.

TPU-native re-design of ``/root/reference/src/horizontal-line.h`` (the whole
file, 106 LoC).  The reference operates point-by-point with scalar branches;
here every predicate is a vectorized jnp expression over a whole ``(W, 3)``
trajectory at once so the SCP linearization runs inside ``jit`` with static
shapes (and ``vmap``s over obstacles, balls, and problem batches).

Collision semantics mirror ``horizontal-line.h:78-92``:
a waypoint "collides" with the line iff the ball around the waypoint's XY
projection is within ``radius`` of the line, OR either adjacent trajectory
segment crosses the line in the XY plane.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from .constraints import INF  # noqa: F401  (re-exported convenience)

ERROR = 1e-3  # feasibility slack, mirrors /root/reference/src/utils.h:31


@struct.dataclass
class HorizontalLine:
    """An infinite horizontal (XY-plane-parallel) line obstacle.

    ``direction``: unit 3-vector along the line with z == 0
    (``horizontal-line.h:23-26`` normalizes the XY input direction).
    ``point``: any point on the line.  ``bypass_below`` mirrors
    ``bypass_from_below`` (``horizontal-line.h:15``): +1.0 if robot balls must
    pass under the line, else -1.0 (stored as a float so it stays a pytree
    leaf and batches under ``vmap``).
    """

    direction: jnp.ndarray  # (3,), unit, z = 0
    point: jnp.ndarray  # (3,)
    bypass_below: jnp.ndarray  # scalar: 1.0 = bypass from below, -1.0 = above

    @classmethod
    def create(cls, direction_xy, point, bypass_from_below: bool = False):
        d = np.asarray(direction_xy, dtype=np.float64)
        d3 = np.array([d[0], d[1], 0.0]) / np.linalg.norm(d)
        return cls(
            direction=jnp.asarray(d3),
            point=jnp.asarray(np.asarray(point, dtype=np.float64)),
            bypass_below=jnp.asarray(1.0 if bypass_from_below else -1.0),
        )

    # --- geometry (each works on (..., 3) batches of points) ----------------

    def distance_vec(self, p):
        """Perpendicular from ``p`` to the line, ``X - P``
        (``horizontal-line.h:44-47``)."""
        rel = p - self.point
        proj = jnp.sum(rel * self.direction, axis=-1, keepdims=True)
        x = self.point + proj * self.direction
        return x - p

    def distance_vec_xy(self, p):
        """XY components of the perpendicular (``horizontal-line.h:49-52``)."""
        return self.distance_vec(p)[..., :2]

    def distance_xy(self, p):
        """Horizontal distance from ``p`` to the line (``horizontal-line.h:54-59``)."""
        return jnp.linalg.norm(self.distance_vec_xy(p), axis=-1)

    def closest_point(self, p):
        """Point on the line closest to ``p`` (``horizontal-line.h:64-66``)."""
        return p + self.distance_vec(p)

    def on_opposite_sides(self, p, q):
        """True if ``p`` and ``q`` are on opposite sides in XY
        (``horizontal-line.h:68-72``)."""
        dp = self.distance_vec_xy(p)
        dq = self.distance_vec_xy(q)
        return jnp.sum(dp * dq, axis=-1) < 0

    def is_close(self, p, radius):
        """Ball of ``radius`` at ``p`` intersects the line in XY
        (``horizontal-line.h:74-76``)."""
        return self.distance_xy(p) < radius

    def has_collision(self, trajectory_xyz, radius):
        """Per-waypoint collision mask for a ``(W, 3)`` trajectory.

        Vectorized equivalent of ``horizontal-line.h:78-92`` evaluated for all
        waypoints at once: close to the line, or either adjacent segment
        crosses it in XY.
        """
        p = trajectory_xyz
        close = self.is_close(p, radius)  # (W,)
        crosses = self.on_opposite_sides(p[:-1], p[1:])  # (W-1,) segment t..t+1
        false_pad = jnp.zeros((1,), dtype=bool)
        prev_cross = jnp.concatenate([false_pad, crosses])  # segment (t-1, t)
        next_cross = jnp.concatenate([crosses, false_pad])  # segment (t, t+1)
        return close | prev_cross | next_cross

    def is_above(self, p, radius):
        """Ball at ``p`` is clear on its required side of the line, with the
        reference's ``radius ∓ ERROR`` slack (``horizontal-line.h:94-98``)."""
        dz = (p - self.point)[..., 2]
        below_ok = dz <= -radius + ERROR
        above_ok = dz >= radius - ERROR
        return jnp.where(self.bypass_below > 0, below_ok, above_ok)

    @property
    def bypass_from_below(self):
        return self.bypass_below > 0


def stack_lines(lines) -> HorizontalLine:
    """Stack a list of ``HorizontalLine``s into one batched pytree with a
    leading obstacle axis, for ``vmap`` over obstacles."""
    if not lines:
        return HorizontalLine(
            direction=jnp.zeros((0, 3)),
            point=jnp.zeros((0, 3)),
            bypass_below=jnp.zeros((0,)),
        )
    return HorizontalLine(
        direction=jnp.stack([l.direction for l in lines]),
        point=jnp.stack([l.point for l in lines]),
        bypass_below=jnp.stack([jnp.reshape(l.bypass_below, ()) for l in lines]),
    )
