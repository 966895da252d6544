"""HorizontalLine geometry tests — mirror of LineUtilTest (test.cpp:82-100)
plus vectorized collision-mask checks."""
import jax.numpy as jnp
import numpy as np
import pytest

from osqp_solver_tpu.gomp.geometry import ERROR, HorizontalLine, stack_lines


def test_x_axis_line():
    """test.cpp:82-100: line through (1,1,1) along +x."""
    line = HorizontalLine.create([2, 0], [1, 1, 1])

    assert float(jnp.linalg.norm(line.distance_vec(jnp.array([2.0, 1, 1])))) == 0
    assert float(jnp.linalg.norm(line.distance_vec(jnp.array([1.0, 2, 1])))) == 1
    assert float(jnp.linalg.norm(line.distance_vec(jnp.array([1.0, 1, 2])))) == 1
    assert float(
        jnp.linalg.norm(line.distance_vec(jnp.array([1.0, 2, 2])))
    ) == pytest.approx(np.sqrt(2))

    assert float(line.distance_xy(jnp.array([2.0, 1, 1]))) == 0
    assert float(line.distance_xy(jnp.array([1.0, 2, 1]))) == 1
    assert float(line.distance_xy(jnp.array([1.0, 1, 2]))) == 0

    p = jnp.array([1.1, 1.2, 1.3])
    np.testing.assert_allclose(
        np.asarray(line.closest_point(p)), [1.1, 1.0, 1.0], atol=1e-12
    )


def test_opposite_sides_and_close():
    line = HorizontalLine.create([1, 0], [0, 0, 0])
    assert bool(line.on_opposite_sides(jnp.array([0.0, 1, 0]), jnp.array([0.0, -1, 0])))
    assert not bool(
        line.on_opposite_sides(jnp.array([0.0, 1, 0]), jnp.array([5.0, 2, 0]))
    )
    assert bool(line.is_close(jnp.array([0.0, 0.05, 3.0]), 0.1))
    assert not bool(line.is_close(jnp.array([0.0, 0.2, 0.0]), 0.1))


def test_has_collision_mask():
    """Vectorized equivalent of horizontal-line.h:78-92: a waypoint collides
    if close OR either adjacent segment crosses the line in XY."""
    line = HorizontalLine.create([1, 0], [0, 0, 0])
    traj = jnp.array(
        [
            [0.0, 1.0, 0.0],  # far, next segment crosses -> collision
            [0.0, -1.0, 0.0],  # crossing on both neighbours? prev crosses -> yes
            [0.0, -2.0, 0.0],  # far, no adjacent crossing -> no
            [0.0, -0.05, 0.0],  # close -> yes
        ]
    )
    mask = np.asarray(line.has_collision(traj, radius=0.1))
    np.testing.assert_array_equal(mask, [True, True, False, True])


def test_is_above_with_slack():
    """horizontal-line.h:94-98: radius ∓ ERROR slack, side picked by
    bypass_from_below."""
    above = HorizontalLine.create([1, 0], [0, 0, 1.0], bypass_from_below=False)
    below = HorizontalLine.create([1, 0], [0, 0, 1.0], bypass_from_below=True)
    r = 0.1
    p_above = jnp.array([0.0, 0.0, 1.0 + r - ERROR / 2])
    p_below = jnp.array([0.0, 0.0, 1.0 - r + ERROR / 2])
    assert bool(above.is_above(p_above, r))
    assert not bool(above.is_above(p_below, r))
    assert bool(below.is_above(p_below, r))
    assert not bool(below.is_above(p_above, r))


def test_stack_lines_batches():
    lines = [
        HorizontalLine.create([1, 0], [0, 0, 0.5], True),
        HorizontalLine.create([0, 1], [0.3, 0, 0.6], False),
    ]
    batched = stack_lines(lines)
    assert batched.direction.shape == (2, 3)
    assert batched.point.shape == (2, 3)
    empty = stack_lines([])
    assert empty.direction.shape == (0, 3)

pytestmark = pytest.mark.quick  # fast tier: see CLAUDE.md


# ----------------------------------------------------------- SphereObstacle


def test_sphere_violates_threshold():
    """Keep-out test with the reference's ERROR slack: a ball of radius r
    violates iff dist(center) < R + r - ERROR."""
    from osqp_solver_tpu.gomp.geometry import SphereObstacle

    s = SphereObstacle.create([1.0, 0.0, 0.0], radius=0.5)
    r = 0.1
    pts = jnp.array([
        [1.0, 0.0, 0.0],            # center: violates
        [1.0, 0.59, 0.0],           # inside R + r - ERROR: violates
        [1.0, 0.6 - ERROR / 2, 0.0],  # within slack: OK
        [1.0, 0.7, 0.0],            # clear
    ])
    v = np.asarray(s.violates(pts, r))
    assert v.tolist() == [True, True, False, False]


def test_sphere_linearize_rows_math():
    """The supporting-hyperplane row: coefficients n.J, and the bound is
    satisfied with equality margin (dist - R_tot) at the linearization
    point itself — so a point outside the inflated sphere satisfies its
    own row, a point inside violates it."""
    from osqp_solver_tpu.gomp.geometry import SphereObstacle

    rng = np.random.default_rng(7)
    Wn, Nn = 5, 4
    c = np.array([0.3, -0.2, 0.5])
    R, r = 0.4, 0.1
    s = SphereObstacle.create(c, radius=R, margin=10.0)  # all rows live
    pts = rng.normal(size=(Wn, 3))
    jac = rng.normal(size=(Wn, 3, Nn))
    q0 = rng.normal(size=(Wn, Nn))
    jq = np.einsum("waj,wj->wa", jac, q0)
    row, low, upp = (
        np.asarray(a) for a in s.linearize_rows(
            jnp.asarray(pts), jnp.asarray(jac), jnp.asarray(jq), r
        )
    )
    n = (pts - c) / np.linalg.norm(pts - c, axis=-1, keepdims=True)
    np.testing.assert_allclose(row, np.einsum("wa,wan->wn", n, jac), rtol=1e-6)
    assert np.all(upp > 1e29)
    # row.q0 - low == dist - (R + r): the constraint's slack at q0.
    slack = np.einsum("wn,wn->w", row, q0) - low
    dist = np.linalg.norm(pts - c, axis=-1)
    np.testing.assert_allclose(slack, dist - (R + r), rtol=1e-5, atol=1e-6)


def test_sphere_rows_gated_by_margin():
    """Rows are dummy (low ~ -INF) outside radius + ball_r + margin and
    live inside."""
    from osqp_solver_tpu.gomp.geometry import INF, SphereObstacle

    s = SphereObstacle.create([0.0, 0.0, 0.0], radius=0.5, margin=0.2)
    r = 0.1
    pts = jnp.array([[0.75, 0.0, 0.0], [0.85, 0.0, 0.0]])  # in / out
    jac = jnp.ones((2, 3, 3))
    jq = jnp.zeros((2, 3))
    _, low, _ = s.linearize_rows(pts, jac, jq, r)
    low = np.asarray(low)
    assert low[0] > -1e29  # live
    assert low[1] < -1e29  # dummy
