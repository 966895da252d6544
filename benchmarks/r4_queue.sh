#!/bin/bash
# Round-4 pending TPU measurements (run when the tunnel is healthy).
# Waits for the relay to answer a tiny dispatch, then runs the queue
# serially.  Usage: bash benchmarks/r4_queue.sh [outdir]
set -u
OUT=${1:-/tmp/r4_queue}
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

probe() {
  timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
jax.devices()
float(jnp.sum(jnp.ones((128, 128))))
EOF
}

echo "[r4_queue] waiting for relay..."
until probe; do
  echo "[r4_queue] relay still dead $(date +%H:%M:%S)"
  sleep 120
done
echo "[r4_queue] relay alive $(date +%H:%M:%S)"

run() {
  name=$1; shift
  echo "=== $name $(date +%H:%M:%S) ==="
  timeout 2400 "$@" >"$OUT/$name.json" 2>"$OUT/$name.log"
  echo "--- $name exit=$? ---"
  tail -4 "$OUT/$name.log"
  cat "$OUT/$name.json" 2>/dev/null
}

# 1. Full time-scaling semantics (VERDICT #1 bench row): the reference's
#    run(start,end) 10-segment search, batched.  W=100-class + iiwa14.
run full_ur5e python benchmarks/planner_batch.py --full --batch 1024 \
  --waypoints 50 --segments 10 --ct 3 --rho 0.04 --scaling 3 --reps 3
run full_iiwa14 python benchmarks/planner_batch.py --full --batch 1024 \
  --waypoints 50 --segments 10 --ct 3 --rho 0.04 --scaling 3 --reps 3 \
  --robot iiwa14
# W=802 flagship at the measured batch knee.
run full_w802 python benchmarks/planner_batch.py --full --batch 128 \
  --waypoints 802 --segments 10 --ct 3 --rho 0.02 --scaling 3 --reps 2

# 2. 7-DOF cost decomposition at pinned iteration count (VERDICT #5).
run dof_decompose python benchmarks/dof_decompose.py

# 3. Anderson fleet-scale A/B on the pathological-rho class (VERDICT #8).
RHOS=0.3,0.5,1.0 ADAPTIVE=0 ANDERSON=0 run anderson_off python benchmarks/rho_sweep.py 5
RHOS=0.3,0.5,1.0 ADAPTIVE=0 ANDERSON=4 run anderson_on  python benchmarks/rho_sweep.py 5
RHOS=1.0 ADAPTIVE=1 ANDERSON=0 run anderson_adapt_off python benchmarks/rho_sweep.py 5
RHOS=1.0 ADAPTIVE=1 ANDERSON=4 run anderson_adapt_on  python benchmarks/rho_sweep.py 5

# 4. Headline refresh.
run bench python bench.py

echo "=== r4_queue done; results in $OUT ==="
