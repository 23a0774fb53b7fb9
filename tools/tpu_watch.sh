#!/bin/bash
# Tunnel-recovery watcher (VERDICT r3 next #1: "keep the recovery watcher
# pattern from session 4 armed from day one").
#
# Loop: probe the TPU backend with a tiny matmul under a hard deadline.
# On the first success, immediately run the queued measurement battery
# and then bench.py, logging everything; write marker files so the
# session can see progress at a glance.
#
# Usage: bash tools/tpu_watch.sh [battery_log]
set -u
BLOG=${1:-/tmp/r4_battery.log}
WLOG=/tmp/tpu_watch.log
MARKER_UP=/tmp/tpu_up
MARKER_DONE=/tmp/r4_battery_done
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

rm -f "$MARKER_UP" "$MARKER_DONE"
: > "$WLOG"
echo "watcher armed $(date)" >> "$WLOG"

probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128))
print('PROBE_OK', float((x@x).sum()), jax.devices()[0].platform)
" >> "$WLOG" 2>&1
}

n=0
while true; do
  n=$((n+1))
  echo "--- probe $n $(date +%H:%M:%S) ---" >> "$WLOG"
  if probe; then
    echo "TUNNEL UP at probe $n $(date)" >> "$WLOG"
    date > "$MARKER_UP"
    break
  fi
  sleep 120
done

echo "launching battery -> $BLOG" >> "$WLOG"
bash tools/r3_battery.sh "$BLOG"
echo "battery rc=$? $(date)" >> "$WLOG"

echo "running bench.py" >> "$WLOG"
timeout 2700 python -u bench.py > /tmp/r4_bench_self.jsonl 2>> "$WLOG"
echo "bench rc=$? $(date)" >> "$WLOG"
date > "$MARKER_DONE"
echo "WATCHER DONE $(date)" >> "$WLOG"
