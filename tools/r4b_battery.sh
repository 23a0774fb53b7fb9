#!/bin/bash
# Round-4 follow-up battery: (a) combination schedules the r3 battery did
# not cover — shadow prefixes composed with band-8 / short-prefix / entry
# variants, to pick the shipping default; (b) the relaxed-fidelity
# hardware measurement (VERDICT r3 next #4). Serial: one TPU process at a
# time (the axon tunnel contends).
# Usage: bash tools/r4b_battery.sh [logfile]
set -u
LOG=${1:-/tmp/r4b_battery.log}
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout 2400 python -u "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}

: > "$LOG"

# 1) shadow-prefix composed onto the best primary schedules from the r3
#    battery (band-8 1736, short-prefix 1769, entry+prefix 1763) plus the
#    r3-battery winner re-measured as control (1718)
run tools/sweep_b3.py --reps 3 --schedules "\
0,6,256,3,2,0,0,0,8,1/1,2,4,4,4,4/1,4 \
0,6,256,3,1,0,0,0,8,1,8/1,2,4,4,4,4/1,4 \
0,4,256,3,2,0,0,0,8,1/1,2,4,4/1,4 \
0,6,256,3,2,0,0,0,8,1,0,1/1,2,4,4,4,4/1,4 \
0,4,256,3,1,0,0,0,8,1,8/1,2,4,4/1,4"

# 2) relaxed-fidelity measurement on B3 (speedup + hit-mask delta + PSNR)
run tools/fidelity_relaxed.py --reps 3 --strides 4,8,16

date > /tmp/r4b_battery_done
echo "R4B BATTERY DONE $(date)" >> "$LOG"
