#!/bin/bash
# Round-5 battery 4: bisect WHERE sort_mode=1's in-context loss lives.
# micro_sort says one payload sort costs ~30 ms vs argsort+row_gather
# ~122 ms at full P (and mixed payload dtypes are free), yet mode 1
# lost 150 ms/frame. sort_mode=2 applies the payload sort to march
# resort rounds only, =3 to the shade sort only; control = banks=3
# shipping default.
set -u
LOG=${1:-/tmp/r5d_battery.log}
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout 3600 python -u "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}

: > "$LOG"

run tools/sweep_b3.py --reps 3 --schedules "\
0,4,256,3,2,8,1,16,0,0,3/1,2,4,4/1,4 \
0,4,256,3,2,8,1,16,0,0,3,-1,2/1,2,4,4/1,4 \
0,4,256,3,2,8,1,16,0,0,3,-1,3/1,2,4,4/1,4 \
0,4,256,3,2,8,1,16,0,0,3,-1,1/1,2,4,4/1,4"

echo "R5D BATTERY DONE $(date)" >> "$LOG"
