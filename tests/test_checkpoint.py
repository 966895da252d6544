"""Checkpoint/resume round trip for solver sessions (SURVEY.md §5)."""
import jax
import numpy as np
import pytest

from osqp_solver_tpu.ops import admm, session as S
from osqp_solver_tpu.utils import checkpoint

from test_admm import random_qp


def test_session_round_trip(tmp_path):
    qp = random_qp(jax.random.PRNGKey(0), n=8, m=12)
    sess = S.setup(qp)
    sess, res1 = S.solve(sess)
    path = str(tmp_path / "sess.npz")
    checkpoint.save(path, sess)
    restored = checkpoint.load(path, sess)
    # resumed session warm-starts identically
    _, res2 = S.solve(restored)
    np.testing.assert_allclose(np.asarray(res2.x), np.asarray(res1.x), atol=5e-3)
    assert int(res2.iterations) <= admm.Settings().check_termination


def test_checkpoint_validation(tmp_path):
    """v2 metadata: wrong template structure or shapes fail fast with clear
    errors instead of silently mis-assigning arrays (VERDICT r1 weak #8)."""
    import numpy as np
    import pytest

    from osqp_solver_tpu.ops.qp import dense_qp
    from osqp_solver_tpu.utils import checkpoint

    qp = dense_qp(np.eye(3), np.zeros(3), np.ones((2, 3)), -np.ones(2), np.ones(2))
    path = str(tmp_path / "state.npz")
    checkpoint.save(path, qp)

    # correct round-trip
    back = checkpoint.load(path, qp)
    np.testing.assert_allclose(np.asarray(back.P), np.asarray(qp.P))

    # structure mismatch: different pytree (tuple of two leaves)
    with pytest.raises(ValueError, match="structure mismatch|leaves"):
        checkpoint.load(path, (np.zeros(3), np.zeros(3)))

    # shape mismatch with strict_shapes
    qp_other = dense_qp(
        np.eye(4), np.zeros(4), np.ones((2, 4)), -np.ones(2), np.ones(2)
    )
    with pytest.raises(ValueError, match="template expects"):
        checkpoint.load(path, qp_other)

pytestmark = pytest.mark.quick  # fast tier: see CLAUDE.md
