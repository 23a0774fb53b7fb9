#!/bin/bash
# Round-5 follow-up battery: banks=2 interaction sweep.
# r5 found banks=2 (independent ray wavefronts, ILP interleave) takes
# B3 1475 -> 1105 ms and saturates at 2 banks. The serve DMA traffic
# doubles with banks, so the r4f-converged band/n_col/prefix optima
# must be re-checked under banks=2 before it ships as default.
# Grammar: fb,r,rb,nc,l0,unroll,sub,band,sdir,relax[,banks[,coarse0[,sortm]]]
set -u
LOG=${1:-/tmp/r5b_battery.log}
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout 3600 python -u "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}

: > "$LOG"

# control (banks=2 winner) first, then band / n_col / prefix variations
run tools/sweep_b3.py --reps 3 --schedules "\
0,4,256,3,2,8,1,16,0,0,2/1,2,4,4/1,4 \
0,4,256,3,2,8,1,8,0,0,2/1,2,4,4/1,4 \
0,4,256,3,2,8,1,32,0,0,2/1,2,4,4/1,4 \
0,4,256,2,2,8,1,16,0,0,2/1,2,4,4/1,4 \
0,4,256,4,2,8,1,16,0,0,2/1,2,4,4/1,4 \
0,4,256,3,2,8,1,16,0,0,2/1,2,4/1,4 \
0,4,256,3,2,8,1,16,0,0,2/1,2,2,4,4/1,4 \
0,4,256,3,2,16,1,16,0,0,2/1,2,4,4/1,4 \
0,4,256,3,2,8,1,16,0,0,3/1,2,4,4/1,4"

echo "R5B BATTERY DONE $(date)" >> "$LOG"
