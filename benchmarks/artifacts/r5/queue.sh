#!/bin/bash
# Round-5 TPU measurement queue: stall-detection A/B (W=50) + W=802 batch sweep.
# Runs serially; each result JSON line lands in /tmp/r5_queue/<name>.json,
# stderr log in /tmp/r5_queue/<name>.log.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/tmp/r5_queue
mkdir -p "$OUT"

probe() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
jax.devices(); float(jnp.sum(jnp.ones((128, 128))))
EOF
}

run() {
  name=$1; shift
  # Wait for the relay if it is down (poll every 2 min, give up after 40 min).
  for i in $(seq 1 20); do
    probe && break
    echo "[$name] relay down, waiting (probe $i)" >> "$OUT/driver.log"
    sleep 120
  done
  echo "[$(date +%T)] START $name: $*" >> "$OUT/driver.log"
  timeout 3600 python /root/repo/benchmarks/planner_batch.py "$@" \
    > "$OUT/$name.json" 2> "$OUT/$name.log"
  echo "[$(date +%T)] DONE $name rc=$?" >> "$OUT/driver.log"
}

# 1. New headline: stock settings (stall detection ON by default, max_iter=4000)
run w50_default      --full --batch 1024 --waypoints 50 --ct 3 --rho 0.04 --scaling 3
# 2. Same-session comparator: exact OSQP give-up semantics (stall off)
run w50_stall_off    --full --batch 1024 --waypoints 50 --ct 3 --rho 0.04 --scaling 3 --stall-checks 0
# 3. Same-session comparator: the r4 max_iter=300 knob
run w50_cap300       --full --batch 1024 --waypoints 50 --ct 3 --rho 0.04 --scaling 3 --max-iter 300
# 4-5. W=802 flagship batch sweep at the capped setting (r4 measured batch 128 only)
run w802_b256_cap300 --full --batch 256 --waypoints 802 --ct 3 --rho 0.02 --scaling 3 --max-iter 300
run w802_b512_cap300 --full --batch 512 --waypoints 802 --ct 3 --rho 0.02 --scaling 3 --max-iter 300
# 6. W=802 at stock settings with stall detection (the no-knob flagship row)
run w802_b256_default --full --batch 256 --waypoints 802 --ct 3 --rho 0.02 --scaling 3

echo "[$(date +%T)] QUEUE COMPLETE" >> "$OUT/driver.log"
