"""Example-app smoke test: the end-to-end demo binary stays green (the
reference's example is its only integration test, SURVEY.md §4)."""
import pathlib
import subprocess
import sys


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
