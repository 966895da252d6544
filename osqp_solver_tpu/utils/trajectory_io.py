"""Trajectory ``.data`` file writers — byte-compatible with the reference.

The reference example dumps the optimized trajectory via default
``std::ostream`` double formatting (``/root/reference/examples/solver-example.cpp:73-81``):
6 significant digits, which is exactly printf/%g semantics — so Python's
``format(v, 'g')`` reproduces the bytes.  Parity is pinned by
``tests/test_example_app.py::test_data_format_byte_parity_with_cpp``, which
compiles a C++ golden generator (``native/data_format_check.cpp``) and
byte-compares.
"""
from __future__ import annotations

import numpy as np


def format_double(v: float) -> str:
    """One double, formatted as C++ ``operator<<(std::ostream&, double)``
    with default precision (6 significant digits)."""
    return f"{float(v):g}"


def ctrl_lines(q: np.ndarray) -> str:
    """``output_trajectory_ctrl.data`` contents for a ``(W, N)`` joint
    trajectory (``solver-example.cpp:76``)."""
    return "".join(
        " ".join(format_double(v) for v in row) + "\n" for row in np.asarray(q)
    )


def xyz_lines(points: np.ndarray) -> str:
    """``output_trajectory_xyz.data`` contents for ``(W, 3)`` FK positions
    (``solver-example.cpp:78``)."""
    return "".join(
        f"({format_double(p[0])}, {format_double(p[1])}, {format_double(p[2])})\n"
        for p in np.asarray(points)
    )


def write_trajectory_files(q, points, ctrl_path, xyz_path) -> None:
    with open(ctrl_path, "w") as f:
        f.write(ctrl_lines(q))
    with open(xyz_path, "w") as f:
        f.write(xyz_lines(points))
