"""Ad-hoc: lane-major driver (ops/admm_lane.py) vs vmapped driver on TPU.

Measures the honest full-GOMP class at batch 1024 through both drivers.
"""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from bench import build_honest_batch
from osqp_solver_tpu.gomp.trajectory_qp_lane import to_lane
from osqp_solver_tpu.ops import admm
from osqp_solver_tpu.ops.admm_lane import solve_batched_lane


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(a):
    return float(jnp.sum(a))


def main():
    dtype = jnp.float32
    BATCH, W, N = 1024, 100, 6
    settings = dataclasses.replace(
        admm.Settings(), check_termination=10, adaptive_rho_interval=20
    )
    t0 = time.time()
    qps = build_honest_batch(BATCH, W, N, dtype)
    sync(qps.ws_l)
    log(f"build: {time.time()-t0:.1f}s")

    lane = jax.jit(to_lane)(qps)
    sync(lane.q_vec)

    def measure(fn, arg, label, reps=10):
        f = jax.jit(lambda a: fn(a, settings))
        t0 = time.time()
        res = f(arg)
        sync(res.x)
        log(f"[{label}] compile+first: {time.time()-t0:.1f}s")
        n_opt = int(np.sum(np.asarray(res.status) == 0))
        log(f"[{label}] optimal {n_opt}/{BATCH} iters p50={int(np.median(res.iterations))}")
        t0 = time.time()
        outs = [f(arg) for _ in range(reps)]
        for o in outs:
            sync(o.x)
        dt = (time.time() - t0) / reps
        log(f"[{label}] steady: {dt*1e3:.1f} ms/batch -> {n_opt/dt:.1f} QPs/s")
        return res

    r_v = measure(admm.solve_batched, qps, "vmapped")
    r_l = measure(solve_batched_lane, lane, "lane")
    # parity on TPU
    same_status = np.array_equal(np.asarray(r_v.status), np.asarray(r_l.status))
    dx = float(np.max(np.abs(np.asarray(r_v.x) - np.asarray(r_l.x))))
    log(f"status match: {same_status}  max|dx|={dx:.2e}")


if __name__ == "__main__":
    main()
