#!/bin/bash
# Round-5 battery 3: (a) paired banks=2-vs-3 confirm (r5b saw 1079 vs
# 1058 in separate compiles; pair them in one process to rule out
# session drift), (b) mixed/bitcast payload-sort rows (why sort_mode=1
# lost 150 ms in context while sort_payload wins in isolation),
# (c) B2/B4 pinned-camera rows under banks defaults.
set -u
LOG=${1:-/tmp/r5c_battery.log}
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout 3600 python -u "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}

: > "$LOG"

run tools/sweep_b3.py --reps 3 --schedules "\
0,4,256,3,2,8,1,16,0,0,2/1,2,4,4/1,4 \
0,4,256,3,2,8,1,16,0,0,3/1,2,4,4/1,4 \
0,4,256,3,2,4,1,16,0,0,3/1,2,4,4/1,4"

run tools/micro_sort.py

run tools/check_b2b4.py

echo "R5C BATTERY DONE $(date)" >> "$LOG"
