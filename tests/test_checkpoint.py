"""Checkpoint/resume round trip for solver sessions (SURVEY.md §5)."""
import jax
import numpy as np

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
