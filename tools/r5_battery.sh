#!/bin/bash
# Round-5 measurement battery (current 13-field sweep grammar:
# fb,r,rb,nc,l0,unroll,sub,band,sdir,relax[,banks[,coarse0[,sortm]]]).
# Serial: one TPU process at a time (the axon tunnel contends).
# Usage: bash tools/r5_battery.sh [logfile]
set -u
LOG=${1:-/tmp/r5_battery.log}
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout 3600 python -u "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}

: > "$LOG"

# 1) VPU ceiling: dependency-chain latency vs issue width (slope-timed)
run tools/micro_vpu.py

# 2) ray banks + pass-0 fold + payload sort on B3 (control row first);
#    shipping default = 0,4,256,3,2,8,1,16,0,0 + /1,2,4,4 /1,4
run tools/sweep_b3.py --reps 3 --schedules "\
0,4,256,3,2,8,1,16,0,0/1,2,4,4/1,4 \
0,4,256,3,2,8,1,16,0,0,1,-1,1/1,2,4,4/1,4 \
0,4,256,3,2,8,1,16,0,0,2/1,2,4,4/1,4 \
0,4,256,3,2,4,1,16,0,0,2/1,2,4,4/1,4 \
0,4,256,3,2,8,1,16,0,0,4/1,2,4,4/1,4 \
0,4,256,3,2,2,1,16,0,0,4/1,2,4,4/1,4 \
0,4,256,3,2,8,1,16,0,0,1,0/1,2,4,4/1,4 \
0,4,256,3,2,8,1,16,0,0,1,8/1,2,4,4/1,4 \
0,4,256,3,2,8,1,16,0,0,1,16/1,2,4,4/1,4 \
0,4,256,3,2,8,1,16,0,0,1,32/1,2,4,4/1,4"

# 3) sort building blocks at B3 scale (counting-sort decision data)
run tools/micro_sort.py

# 4) MXU corner-gather formulations (scan vs muladd vs mxu_row/mxu_dot)
run tools/micro_mxu.py

echo "R5 BATTERY DONE $(date)" >> "$LOG"
