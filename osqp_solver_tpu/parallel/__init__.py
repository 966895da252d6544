"""Multi-chip / multi-host scaling surface (SURVEY.md §2.3).

Batch axis (DP analogue), horizon axis (TP/SP analogue — separator-only
Schur decomposition), the combined 2-D mesh, and the multi-process runtime.
"""
from .banded import (  # noqa: F401
    BandedQP,
    ShardedBandedQP,
    banded_from_trajectory,
    solve_banded_sharded,
    solve_banded_sharded_2d,
)
from .batch import solve_batch, solve_batch_sharded  # noqa: F401
from .horizon import (  # noqa: F401
    ChunkedTrajectoryQP,
    as_chunked,
    auto_chunks,
    solve_horizon_sharded,
)
from .mesh import BATCH_AXIS, HORIZON_AXIS, make_mesh  # noqa: F401
from .schur import (  # noqa: F401
    schur_factor,
    schur_solve_cached,
    schur_solve_reference,
    schur_solve_sharded,
)
