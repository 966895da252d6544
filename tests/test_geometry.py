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
    violates iff dist(center) < R + r - ERROR.  Each point is probed as
    its own 1-waypoint trajectory — ``violates`` reads its input as a
    trajectory and also flags between-waypoint tunneling (see
    test_sphere_segment_tunneling_detected)."""
    from osqp_solver_tpu.gomp.geometry import SphereObstacle

    s = SphereObstacle.create([1.0, 0.0, 0.0], radius=0.5)
    r = 0.1
    pts = [
        ([1.0, 0.0, 0.0], True),            # center: violates
        ([1.0, 0.59, 0.0], True),           # inside R + r - ERROR: violates
        ([1.0, 0.6 - ERROR / 2, 0.0], False),  # within slack: OK
        ([1.0, 0.7, 0.0], False),           # clear
    ]
    for p, expect in pts:
        v = np.asarray(s.violates(jnp.asarray([p]), r))
        assert v.tolist() == [expect], p


def test_sphere_linearize_rows_math():
    """Row math vs an independent numpy mirror: per waypoint either the
    absolute radial supporting-hyperplane cut (own proximity) or the
    relative depth*lever push (interior adjacent-segment crossing — the
    tunneling discipline), selected by whichever approach is closest.
    Slack at the linearization point: dist - (R+r) for radial cuts,
    (d_seg - (R+r))*lever for segment cuts."""
    from osqp_solver_tpu.gomp.geometry import SphereObstacle

    rng = np.random.default_rng(7)
    Wn, Nn = 5, 4
    c = np.array([0.3, -0.2, 0.5])
    R, r = 0.4, 0.1
    Rtot = R + r
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

    # independent numpy mirror of the cut-selection rule
    def seg_info(a, b):
        d = b - a
        t = np.clip(((c - a) @ d) / max(d @ d, 1e-18), 0.0, 1.0)
        rel = a + t * d - c
        return rel, np.linalg.norm(rel), t

    rels = pts - c
    dists = np.linalg.norm(rels, axis=-1)
    segs = [seg_info(pts[i], pts[i + 1]) for i in range(Wn - 1)]
    exp_n = np.zeros((Wn, 3))
    exp_slack = np.zeros(Wn)
    for i in range(Wn):
        d_w = dists[i]
        cands = []  # (dist, normal, slack)
        if i > 0:
            rel_s, d_s, t = segs[i - 1]
            if 1e-3 < t < 1 - 1e-3:  # interior crossing only
                lev = 1.0 / np.clip(t, 0.25, 1.0)  # endpoint b lever
                cands.append(("prev", d_s, rel_s, (d_s - Rtot) * lev))
        if i < Wn - 1:
            rel_s, d_s, t = segs[i]
            if 1e-3 < t < 1 - 1e-3:
                lev = 1.0 / np.clip(1.0 - t, 0.25, 1.0)  # endpoint a lever
                cands.append(("next", d_s, rel_s, (d_s - Rtot) * lev))
        # selection: prev if strictly closest, else next if closer than
        # own, else own radial
        prev = next((x for x in cands if x[0] == "prev"), None)
        nxt = next((x for x in cands if x[0] == "next"), None)
        p_d = prev[1] if prev else np.inf
        n_d = nxt[1] if nxt else np.inf
        if p_d < min(d_w, n_d):
            _, _, rel_pick, slack = prev
        elif n_d < d_w:
            _, _, rel_pick, slack = nxt
        else:
            rel_pick, slack = rels[i], d_w - Rtot
        exp_n[i] = rel_pick / np.linalg.norm(rel_pick)
        exp_slack[i] = slack
    np.testing.assert_allclose(
        row, np.einsum("wa,wan->wn", exp_n, jac), rtol=1e-6
    )
    assert np.all(upp > 1e29)
    slack = np.einsum("wn,wn->w", row, q0) - low
    np.testing.assert_allclose(slack, exp_slack, rtol=1e-5, atol=1e-6)


def test_sphere_segment_tunneling_detected():
    """VERDICT r4 next #4: a 2-waypoint hop THROUGH the sphere (both
    endpoints clear) is a violation — the segment's closest approach
    penetrates (the line obstacle's adjacent-segment discipline,
    horizontal-line.h:78-92); and both endpoints' linearized rows become
    live with the SAME segment normal, whose half-space excludes the
    whole tunnel."""
    from osqp_solver_tpu.gomp.geometry import SphereObstacle

    s = SphereObstacle.create([0.0, 0.0, 0.0], radius=0.3, margin=0.1)
    r = 0.05
    pts = jnp.array([
        [-1.0, 0.01, 0.0],   # clear (dist 1.0)
        [1.0, -0.01, 0.0],   # clear, but the hop crosses the sphere
        [2.0, 0.0, 0.0],     # clear; segment 1-2 stays clear
    ])
    v = np.asarray(s.violates(pts, r))
    assert v.tolist() == [True, True, False]

    jac = jnp.tile(jnp.eye(3)[None], (3, 1, 1))  # identity kinematics
    jq = pts  # J.q0 = p0
    row, low, _ = (np.asarray(a) for a in s.linearize_rows(pts, jac, jq, r))
    assert low[0] > -1e29 and low[1] > -1e29  # tunneling endpoints live
    assert low[2] < -1e29  # clear waypoint stays dummy
    # both endpoints share the segment's push direction (center → chord
    # closest point; ⊥-to-chord fallback for a through-center chord)
    np.testing.assert_allclose(row[0], row[1], atol=1e-6)
    # the relative cut demands each endpoint move by depth*lever along n:
    # both rows are violated at the linearization point, so the SCP
    # actually pushes the chord sideways off the sphere
    assert np.einsum("a,a->", row[0], np.asarray(pts[0])) < low[0]
    assert np.einsum("a,a->", row[1], np.asarray(pts[1])) < low[1]


def test_sphere_rows_gated_by_margin():
    """Rows are dummy (low ~ -INF) outside radius + ball_r + margin and
    live inside."""
    from osqp_solver_tpu.gomp.geometry import INF, SphereObstacle

    s = SphereObstacle.create([0.0, 0.0, 0.0], radius=0.5, margin=0.2)
    r = 0.1
    jac = jnp.ones((1, 3, 3))
    jq = jnp.zeros((1, 3))
    for x, live in ((0.75, True), (0.85, False)):  # in / out of the gate
        _, low, _ = s.linearize_rows(
            jnp.array([[x, 0.0, 0.0]]), jac, jq, r
        )
        assert (float(low[0]) > -1e29) == live, x


def test_legacy_four_arg_obstacle_protocol_still_works():
    """Back-compat (round-5 review): the pre-round-5 duck-typed protocol
    was ``linearize_rows(points, jac, jq, radius)`` with no ``movable`` —
    user obstacles written against it must keep planning (the planner
    forwards ``movable`` only to implementations that accept it, via
    ``geometry.call_linearize_rows``)."""
    import jax.numpy as jnp
    import numpy as np

    from osqp_solver_tpu import RobotBall, constraints as C
    from osqp_solver_tpu.gomp.geometry import SphereObstacle
    from osqp_solver_tpu.gomp.planner import GOMPSolver
    from osqp_solver_tpu.ops.status import ExitCode

    inner = SphereObstacle.create([0.25, 0.0, 0.2], radius=0.3, margin=0.2)

    class LegacySphere:
        """Old-protocol wrapper: 4-argument linearize_rows, no movable."""

        def violates(self, points, radius):
            return inner.violates(points, radius)

        def linearize_rows(self, points, jac, jq, radius):
            return inner.linearize_rows(points, jac, jq, radius)

    ball = RobotBall(
        fk=lambda s: s,
        jacobian=lambda s: jnp.eye(3, dtype=s.dtype),
        radius=0.05,
        is_gripper=True,
    )
    solver = GOMPSolver(
        max_waypoints=10, time_step=0.1,
        pos_con=C.in_range(3, -10, 10), vel_con=C.in_range(3, -20, 20),
        acc_con=C.in_range(3, -40, 40), con_3d=C.in_range(3, -10, 10),
        obstacles=[LegacySphere()], balls=[ball],
    )
    res = solver.run(np.array([0.0, 1.0, 0.2]), np.array([0.5, -1.0, 0.2]))
    assert res.status == ExitCode.kOptimal
    W = res.trajectory.size // 6
    q = res.trajectory[: W * 3].reshape(W, 3)
    d = np.linalg.norm(q - np.array([0.25, 0.0, 0.2]), axis=-1)
    assert np.all(d >= 0.3 + 0.05 - 1.5e-3), d.min()
