"""Constraint DSL tests (mirror of constraints.h semantics)."""
import numpy as np
import pytest

from osqp_solver_tpu.gomp import constraints as C


def test_factories():
    c = C.in_range(3, [1, 2, 3], [4, 5, 6])
    np.testing.assert_allclose(c.lower, [1, 2, 3])
    np.testing.assert_allclose(c.upper, [4, 5, 6])

    eq = C.equal([1.0, 2.0])
    np.testing.assert_allclose(eq.lower, eq.upper)

    ge = C.greater_eq([1.0, 2.0])
    np.testing.assert_allclose(ge.lower, [1, 2])
    assert np.all(ge.upper >= C.INF_THRESHOLD)

    le = C.less_eq([1.0, 2.0])
    assert np.all(le.lower <= -C.INF_THRESHOLD)

    anyc = C.any_constraint(2)
    assert np.all(C.is_loose(anyc.lower)) and np.all(C.is_loose(anyc.upper))

    z = C.eq_zero(4)
    np.testing.assert_allclose(z.lower, 0.0)
    np.testing.assert_allclose(z.upper, 0.0)


def test_scaled_preserves_infinities():
    """constraints.h:55-67 — absent (infinite) bounds are unaffected by
    scaling; finite ones multiply (planner folds dt into vel/acc limits,
    gomp-solver.h:29-30)."""
    c = C.in_range(3, [-C.INF, -1.0, -2.0], [C.INF, 1.0, 2.0])
    s = C.scaled(c, 0.1)
    np.testing.assert_allclose(s.lower, [-C.INF, -0.1, -0.2])
    np.testing.assert_allclose(s.upper, [C.INF, 0.1, 0.2])


def test_partial_in_range():
    c = C.in_range(2, None, [1.0, 2.0])
    assert np.all(C.is_loose(c.lower))
    np.testing.assert_allclose(c.upper, [1, 2])

    scalar = C.in_range(3, -1.0, 1.0)
    np.testing.assert_allclose(scalar.lower, -1.0)

pytestmark = pytest.mark.quick  # fast tier: see CLAUDE.md
