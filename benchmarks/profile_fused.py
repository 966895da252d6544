"""Breakdown of the fused lane solve at batch 1024 on TPU: Ruiz, factor,
chunk kernel, termination kernel, adapt-refactor."""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

from bench import build_honest_batch
from osqp_solver_tpu.ops import admm
from osqp_solver_tpu.ops.admm_lane import (
    init_state_lane,
    ruiz_equilibrate_lane,
)
from osqp_solver_tpu.ops.admm_fused import (
    build_coef_pack,
    build_lu_pack,
    fused_admm_chunk,
    pack_factor,
)
from osqp_solver_tpu.ops.residuals_pallas import (
    build_residual_packs,
    termination_quantities_kernel,
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(a):
    return float(jnp.sum(jax.tree.leaves(a)[0]))


def timed(name, f, *args, reps=20):
    g = jax.jit(f)
    r = g(*args)
    sync(r)
    # In-order dispatch; syncing ONLY the last rep barriers on all of them —
    # per-rep readbacks would floor every measurement at the ~27 ms tunnel
    # round-trip.
    t0 = time.time()
    outs = [g(*args) for _ in range(reps)]
    sync(outs[-1])
    dt = (time.time() - t0) / reps
    log(f"{name:28s} {dt*1e3:8.2f} ms")
    return dt


def main():
    dtype = jnp.float32
    BATCH, W, N = 1024, 100, 6
    CT = 15
    settings = dataclasses.replace(
        admm.Settings(), check_termination=CT, adaptive_rho_interval=CT
    )
    lane = build_honest_batch(BATCH, W, N, dtype)
    sync(lane.ws_l)

    scaled, scaling = jax.jit(
        lambda qp: ruiz_equilibrate_lane(qp, settings.scaling)
    )(lane)
    st = jax.jit(
        lambda s: init_state_lane(s, settings), static_argnums=()
    )(scaled)
    coef = build_coef_pack(scaled)
    lu = build_lu_pack(scaled)
    packs = build_residual_packs(scaled, scaling) + (scaling.cinv,)
    pf = jax.jit(lambda s, f: pack_factor(s, f))(scaled, st.factor)

    timed("ruiz (streaming kernel)", lambda qp: ruiz_equilibrate_lane(qp, settings.scaling)[0].q_vec, lane)
    timed("kkt_factor", lambda rv: scaled.kkt_factor(rv, settings.sigma).chol, st.rho_vec)
    timed("pack_factor", lambda f: pack_factor(scaled, f)[0], st.factor)

    def chunk(x, z, y, rho_vec, done):
        out = fused_admm_chunk(
            scaled, None, x, z, y, rho_vec, done, settings,
            coef=coef, lu=lu, packed_factor=pf, return_packed=True,
        )
        return out[5], out[6]

    done = jnp.zeros((BATCH,), bool)
    sp, dp = jax.jit(chunk)(st.x, st.z, st.y, st.rho_vec, done)
    sync(sp)
    dt_chunk = timed(f"fused chunk ({CT} iters)", lambda *a: chunk(*a)[0], st.x, st.z, st.y, st.rho_vec, done)
    log(f"  -> {dt_chunk/CT*1e3:.3f} ms/iteration")
    timed("termination kernel", lambda s, d: termination_quantities_kernel(scaled, s, d, coef, packs).prim_res, sp, dp)




def sub():
    """Sub-piece timing: assembly vs factor kernel vs pack."""
    dtype = jnp.float32
    BATCH, W, N = 1024, 100, 6
    settings = dataclasses.replace(
        admm.Settings(), check_termination=11, adaptive_rho_interval=33
    )
    lane = build_honest_batch(BATCH, W, N, dtype)
    sync(lane.ws_l)
    scaled, scaling = jax.jit(
        lambda qp: ruiz_equilibrate_lane(qp, settings.scaling)
    )(lane)
    st = jax.jit(lambda s: init_state_lane(s, settings))(scaled)
    diag, lower = jax.jit(
        lambda rv: scaled.kkt_blocks(rv, settings.sigma)
    )(st.rho_vec)
    sync(diag)
    from osqp_solver_tpu.ops.pallas_tridiag import factor_lane_major

    timed("kkt_blocks (assembly)", lambda rv: scaled.kkt_blocks(rv, settings.sigma)[0], st.rho_vec)
    timed("factor_lane_major", lambda d, l: factor_lane_major(d, l)[0], diag, lower)
    from osqp_solver_tpu.ops.admm_lane import _rho_vec as rv_fn
    timed("rho_vec", lambda rb: rv_fn(rb, scaled.l, scaled.u), st.rho_bar)
    from osqp_solver_tpu.ops.admm_fused import pack_state
    timed("pack_state", lambda x, z, y: pack_state(scaled, x, z, y), st.x, st.z, st.y)
    timed("build_coef_pack", lambda s: build_coef_pack(s), scaled)
    timed("build_lu_pack", lambda s: build_lu_pack(s), scaled)
    timed("build_residual_packs", lambda s: build_residual_packs(s, scaling)[0], scaled)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "sub":
        sub()
    else:
        main()
