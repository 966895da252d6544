"""Example-app smoke test: the end-to-end demo binary stays green (the
reference's example is its only integration test, SURVEY.md §4)."""
import pathlib
import subprocess
import sys

import pytest

# Mid tier: solver+planner integration paths the quick tier skips
# (pyproject `mid` marker; see CLAUDE.md).
pytestmark = pytest.mark.mid


def test_example_runs_small(tmp_path):
    repo = pathlib.Path(__file__).resolve().parents[1]
    out = subprocess.run(
        [
            sys.executable,
            str(repo / "examples" / "solver_example.py"),
            "--waypoints", "22", "--segments", "1", "--cpu",
        ],
        cwd=tmp_path,
        capture_output=True,
        text=True,
        timeout=400,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "kOptimal" in out.stdout
    assert (tmp_path / "output_trajectory_ctrl.data").exists()
    assert (tmp_path / "output_trajectory_xyz.data").exists()
    lines = (tmp_path / "output_trajectory_ctrl.data").read_text().splitlines()
    assert len(lines) == 22 and len(lines[0].split()) == 6


def test_data_format_byte_parity_with_cpp(tmp_path):
    """The .data writers byte-match the reference's std::ostream formatting
    (solver-example.cpp:73-81): compile the C++ golden generator and compare
    bytes over a battery of tricky doubles (VERDICT r1 missing #3)."""
    import shutil
    import subprocess

    import numpy as np

    from osqp_solver_tpu.utils.trajectory_io import ctrl_lines, xyz_lines

    if shutil.which("g++") is None:
        import pytest

        pytest.skip("g++ unavailable")
    src = pathlib.Path(__file__).resolve().parents[1] / "native" / "data_format_check.cpp"
    exe = tmp_path / "data_format_check"
    subprocess.run(["g++", "-O1", "-o", str(exe), str(src)], check=True)

    vals = np.array(
        [
            0.0, -0.0, 1.0, -1.0, 3.141592653589793, -2.718281828459045,
            1e-05, -1e-05, 0.000123456789, 123456.789, 1234567.89,
            -9.87654321e-12, 6.2831853071, 0.1, -0.30000000000000004,
            1e30, -1e30, 42.0,
        ]
    )
    # ctrl lines: 3 rows of 6
    got = ctrl_lines(vals.reshape(3, 6))
    want = subprocess.run(
        [str(exe), "ctrl6"] + [repr(float(v)) for v in vals],
        check=True, capture_output=True, text=True,
    ).stdout
    assert got == want

    # xyz lines: 6 rows of 3
    got = xyz_lines(vals.reshape(6, 3))
    want = subprocess.run(
        [str(exe), "xyz3"] + [repr(float(v)) for v in vals],
        check=True, capture_output=True, text=True,
    ).stdout
    assert got == want


def test_mpc_fleet_example_runs_small(tmp_path):
    """The fleet-MPC example (warm-started batched sessions) stays green."""
    import os

    repo = pathlib.Path(__file__).resolve().parents[1]
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=str(repo))
    out = subprocess.run(
        [
            sys.executable,
            str(repo / "examples" / "mpc_fleet_example.py"),
            # W must leave room for the pi-rotation under the velocity /
            # acceleration boxes (W=12 is infeasible for this class).
            "--batch", "4", "--ticks", "3", "--waypoints", "20",
        ],
        cwd=tmp_path,
        capture_output=True,
        text=True,
        timeout=400,
        env=env,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "12/12 optimal" in out.stdout


def test_grasp_example_runs_small(tmp_path):
    """The orientation-constrained grasp demo (grasp pose -> analytic IK
    with DLS cross-check -> run_batch_padded -> exact-FK pose audit) stays
    green end-to-end (VERDICT r4 next #6; reference anchor
    solver-example.cpp:53,98)."""
    import os

    repo = pathlib.Path(__file__).resolve().parents[1]
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=str(repo))
    out = subprocess.run(
        [
            sys.executable,
            str(repo / "examples" / "grasp_example.py"),
            "--grasps", "4", "--waypoints", "22", "--segments", "2",
        ],
        cwd=tmp_path,
        capture_output=True,
        text=True,
        timeout=400,
        env=env,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "optimal 4/4" in out.stdout
    assert "OK" in out.stdout
    # The demo writes the reference's .data outputs for the first grasp.
    assert (tmp_path / "output_trajectory_ctrl.data").exists()
    assert (tmp_path / "output_trajectory_xyz.data").exists()
