"""Small shared types/constants mirroring the reference's utils layer.

Inventory parity with ``/root/reference/src/utils.h``: the ``Axis`` enum
(``utils.h:24-28``), the ``CENTIMETER`` constant (``utils.h:30`` — unused in
the reference too, kept for parity), the ``ERROR`` feasibility slack
(``utils.h:31``, canonical home :mod:`osqp_solver_tpu.gomp.geometry`), and
the ``NoInverseKinematicSolution`` exception (``utils.h:66-70`` — dead code
in the reference; raised here by IK helpers when asked to).
"""
from __future__ import annotations

import enum

from ..gomp.geometry import ERROR  # noqa: F401  (re-export)


class Axis(enum.IntEnum):
    """Workspace axes (``utils.h:24-28``)."""

    X = 0
    Y = 1
    Z = 2


XYZ_AXES = (Axis.X, Axis.Y, Axis.Z)

CENTIMETER = 0.01  # utils.h:30 (unused there as well)


class NoInverseKinematicSolution(RuntimeError):
    """No IK branch reaches the requested point (``utils.h:66-70``)."""

    def __init__(self, point):
        super().__init__(f"No inverse kinematic solution exists for point {point}")
        self.point = point
