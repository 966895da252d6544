"""Structured solve-stats tests (SURVEY.md §5 observability)."""
import jax
import numpy as np
import pytest

from osqp_solver_tpu.ops import admm
from osqp_solver_tpu.utils.observability import StageTimer, solve_stats

from test_admm import random_qp


def test_solve_stats_single():
    qp = random_qp(jax.random.PRNGKey(0), n=8, m=12)
    res = admm.solve(qp)
    s = solve_stats(res)
    assert s["problems"] == 1 and s["optimal"] == 1
    assert s["iterations"]["max"] >= 1
    assert s["prim_res_max"] < 1e-2


def test_solve_stats_batched():
    qps = jax.vmap(lambda k: random_qp(k, n=8, m=12))(
        jax.random.split(jax.random.PRNGKey(1), 4)
    )
    res = jax.vmap(lambda qp: admm.solve(qp))(qps)
    s = solve_stats(res)
    assert s["problems"] == 4 and s["optimal"] == 4


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    d = t.as_dict()
    assert set(d) == {"a", "b"} and d["a"] >= 0

pytestmark = pytest.mark.quick  # fast tier: see CLAUDE.md
