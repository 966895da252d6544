"""Observability: profiler hooks + structured solve statistics.

Replaces the reference's printf-on-the-hot-path observability
(``gomp-solver.h:128,146-165``, ``utils.h:88,92``, ``osqp-wrapper.h:19,47``
and OSQP's ``verbose=true`` iteration log) with structured, batched-friendly
equivalents (SURVEY.md §5): per-problem stats dicts and ``jax.profiler``
trace scopes.
"""
from __future__ import annotations

import contextlib
import json
import sys
import time
from typing import Any, Dict, Iterator, Optional

import numpy as np

from ..ops.status import ExitCode


def solve_stats(result) -> Dict[str, Any]:
    """Structured per-solve statistics from a :class:`SolveResult` (scalar or
    batched).  JSON-serializable — the replacement for OSQP's verbose log."""
    status = np.atleast_1d(np.asarray(result.status))
    iters = np.atleast_1d(np.asarray(result.iterations))
    stats = {
        "problems": int(status.size),
        "optimal": int(np.sum(status == ExitCode.kOptimal)),
        "optimal_inaccurate": int(np.sum(status == ExitCode.kOptimalInaccurate)),
        "primal_infeasible": int(np.sum(status == ExitCode.kPrimalInfeasible)),
        "dual_infeasible": int(np.sum(status == ExitCode.kDualInfeasible)),
        "max_iterations": int(np.sum(status == ExitCode.kMaxIterations)),
        "iterations": {
            "p50": float(np.median(iters)),
            "max": int(np.max(iters)),
            "mean": float(np.mean(iters)),
        },
        "prim_res_max": float(np.max(np.asarray(result.prim_res))),
        "dual_res_max": float(np.max(np.asarray(result.dual_res))),
        "rho_range": [
            float(np.min(np.asarray(result.rho))),
            float(np.max(np.asarray(result.rho))),
        ],
    }
    return stats


def log_stats(result, stream=sys.stderr) -> Dict[str, Any]:
    s = solve_stats(result)
    print(json.dumps(s), file=stream, flush=True)
    return s


@contextlib.contextmanager
def trace(label: str, trace_dir: Optional[str] = None) -> Iterator[None]:
    """Profile a region: ``jax.profiler`` device trace when ``trace_dir`` is
    given, plus a wall-clock span printed to stderr either way."""
    import jax

    t0 = time.time()
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    try:
        with jax.profiler.TraceAnnotation(label):
            yield
    finally:
        if trace_dir:
            jax.profiler.stop_trace()
        print(
            f"[trace] {label}: {time.time() - t0:.3f}s", file=sys.stderr, flush=True
        )


class StageTimer:
    """Accumulating per-stage wall timers (assembly / factor / iterate /
    check) for host-orchestrated loops like the SCP planner."""

    def __init__(self):
        self.totals: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.time() - t0

    def as_dict(self) -> Dict[str, float]:
        return dict(self.totals)
