"""osqp_solver_tpu — TPU-native batched ADMM QP solver + GOMP trajectory stack.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
ZPP-Robotics/OSQP-Solver (see SURVEY.md): an OSQP-semantics ADMM core
(vmapped, fixed shapes, masked convergence), banded/block-tridiagonal KKT
solvers, UR5e analytical kinematics, SCP + horizon-scaling trajectory
planning, and multi-chip scaling via jax.sharding meshes.
"""

__version__ = "0.1.0"

from .gomp import constraints
from .gomp.builder import ConstraintBuilder
from .gomp.geometry import HorizontalLine
from .gomp.layout import TrajectoryLayout, make_layout
from .gomp.trajectory import (
    calc_warm_start,
    linspace_configs,
    smoothness_objective,
    tri_diagonal_matrix,
)
from .models.robot import RobotBall

__all__ = [
    "constraints",
    "ConstraintBuilder",
    "HorizontalLine",
    "TrajectoryLayout",
    "make_layout",
    "RobotBall",
    "tri_diagonal_matrix",
    "smoothness_objective",
    "linspace_configs",
    "calc_warm_start",
]
