#!/bin/bash
# Tunnel-recovery watcher: probe the TPU backend with a tiny matmul under
# a hard deadline; on the first success run the GIVEN battery script and
# then bench.py, logging everything; write marker files so the session
# can see progress at a glance.
#
# The battery script is a required argument since round 5: the retired
# r3/r4b batteries used the pre-r4 13-field schedule grammar and would
# misparse under the current 10-field one (ADVICE r4 #1) — a watcher must
# only ever run a battery written for the CURRENT grammar.
#
# Usage: bash tools/tpu_watch.sh <battery.sh> [battery_log]
set -u
BATTERY=${1:?usage: tpu_watch.sh <battery.sh> [battery_log]}
BLOG=${2:-/tmp/battery.log}
WLOG=/tmp/tpu_watch.log
MARKER_UP=/tmp/tpu_up
MARKER_DONE=/tmp/battery_done
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

rm -f "$MARKER_UP" "$MARKER_DONE"
: > "$WLOG"
echo "watcher armed $(date) battery=$BATTERY" >> "$WLOG"

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
bash "$BATTERY" "$BLOG"
echo "battery rc=$? $(date)" >> "$WLOG"

echo "running bench.py" >> "$WLOG"
timeout 3600 python -u bench.py > /tmp/bench_self.jsonl 2>> "$WLOG"
echo "bench rc=$? $(date)" >> "$WLOG"
date > "$MARKER_DONE"
echo "WATCHER DONE $(date)" >> "$WLOG"
