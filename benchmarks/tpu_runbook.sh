#!/bin/bash
# One-shot TPU measurement sequence (run when the tunnel is healthy).
# Usage: bash benchmarks/tpu_runbook.sh [outdir]
set -u
OUT=${1:-/tmp/runbook}
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name ==="
  timeout 1500 "$@" >"$OUT/$name.json" 2>"$OUT/$name.log"
  echo "--- $name exit=$? ---"
  tail -5 "$OUT/$name.log"
  cat "$OUT/$name.json"
}

# Defaults are the shipped winners (hrec factor form, ct=2, emit_term,
# warmup 21, 3 Ruiz iterations); the variants below are the A/B controls.
run bench python bench.py
OSQP_FACTOR_FORM=gain run bench_gain python bench.py
OSQP_TERM_FUSED=off run bench_noterm python bench.py
OSQP_WARMUP=0 run bench_nowarmup python bench.py
OSQP_CT=1 run bench_ct1 python bench.py
OSQP_CT=3 run bench_ct3 python bench.py
OSQP_CT=5 run bench_ct5 python bench.py
RHOS=0.05 ADAPTIVE=0 ALPHA=1.7 run alpha17 python benchmarks/rho_sweep.py 17
RHOS=0.05 ADAPTIVE=0 ALPHA=1.8 run alpha18 python benchmarks/rho_sweep.py 17
RHOS=0.05 ADAPTIVE=0 SCALING=5 run scaling5 python benchmarks/rho_sweep.py 17
RHOS=0.05 ADAPTIVE=0 run ct34 python benchmarks/rho_sweep.py 34
run mpc_fleet python benchmarks/mpc_fleet.py
run mpc_fleet_ct2 python benchmarks/mpc_fleet.py --ct 2
run planner python benchmarks/planner_batch.py --batch 1024 --skip-vmap --rho 0.05 --ct 13 --ari 39
run planner_tuned python benchmarks/planner_batch.py --batch 1024 --skip-vmap --rho 0.04 --ct 3 --ari 45 --scaling 3
run planner_iiwa14 python benchmarks/planner_batch.py --batch 1024 --skip-vmap --rho 0.04 --ct 3 --scaling 3 --robot iiwa14
# FULL time-scaling semantics (gomp-solver.h:38-55), max_iter=300 fleet cap
# (bit-identical plans vs the OSQP-default 4000 — BASELINE.md round-4):
run planner_full python benchmarks/planner_batch.py --full --batch 1024 --waypoints 50 --segments 10 --ct 3 --rho 0.04 --scaling 3 --max-iter 300 --reps 3
run planner_full_iiwa14 python benchmarks/planner_batch.py --full --batch 1024 --waypoints 50 --segments 10 --ct 3 --rho 0.04 --scaling 3 --max-iter 300 --reps 3 --robot iiwa14
run planner_full_w802 python benchmarks/planner_batch.py --full --batch 128 --waypoints 802 --segments 10 --ct 3 --rho 0.02 --scaling 3 --max-iter 300 --reps 2
# Round 5: stall detection makes STOCK settings the headline (no knob);
# --stall-checks 0 is the pre-r5 OSQP-give-up control (expect ~10x slower).
run planner_full_stock python benchmarks/planner_batch.py --full --batch 1024 --waypoints 50 --segments 10 --ct 3 --rho 0.04 --scaling 3 --reps 3
run planner_full_stalloff python benchmarks/planner_batch.py --full --batch 1024 --waypoints 50 --segments 10 --ct 3 --rho 0.04 --scaling 3 --stall-checks 0 --reps 3
run planner_full_scara python benchmarks/planner_batch.py --full --batch 1024 --waypoints 50 --segments 10 --ct 3 --rho 0.04 --scaling 3 --reps 3 --robot scara
run planner_full_w802_b512 python benchmarks/planner_batch.py --full --batch 512 --waypoints 802 --segments 10 --ct 3 --rho 0.02 --scaling 3 --reps 2
run planner_round_profile python benchmarks/profile_planner_round.py
# w802: batch 512 is the measured knee; --adapt-interval defaults to 60
# (deferred past the 30-iter tail — the old 3*ct=9 fired mid-solve and cost
# 45-vs-30 iterations, BASELINE.md).  batch-128 kept as the r2 control.
run w802 python benchmarks/w802_lane.py --batch 512 --ct 3 --rho 0.02
run w802_b1024 python benchmarks/w802_lane.py --batch 1024 --ct 3 --rho 0.02
run w802_r2control python benchmarks/w802_lane.py --batch 128 --ct 3 --rho 0.02 --adapt-interval 9
run long_horizon python benchmarks/long_horizon.py
run run_all python benchmarks/run_all.py
# CPU-mesh scaling harness (no TPU needed; measures sharding overhead):
run scaling python benchmarks/scaling.py --quick
run scaling_onecore python benchmarks/scaling.py --quick --one-core
echo "=== runbook done; results in $OUT ==="
