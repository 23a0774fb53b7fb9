#!/bin/bash
# Round-4 chain step 3: waits for r4b, then (a) B3 rows for the band-8
# candidate under the AUTO tail (band-8 was only ever measured with the
# forced l0 tail) and a re-confirmation of the shipping default, (b) the
# updated check_b2b4 (new-default era rows incl. band8), (c) bench.py at
# the new defaults so BENCH_ALL.json reflects what ships.
set -u
LOG=${1:-/tmp/r4c_battery.log}
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

while [ ! -f /tmp/r4b_battery_done ]; do sleep 60; done

run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout 2400 python -u "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}

: > "$LOG"

# (a) band-8 with the AUTO tail vs the forced-tail 1595 winner, both on
#     the 4-round prefix + shadow-prefix base; auto-no-band as control
#     (grammar: fb,r,rb,nc,l0,unroll,sub,band,sdir,relax)
run tools/sweep_b3.py --reps 3 --schedules "\
0,4,256,3,2,8,1,8/1,2,4,4/1,4 \
0,4,256,3,1,8,1,8/1,2,4,4/1,4 \
0,4,256,3,2,8,1/1,2,4,4/1,4"

# (b) B2/B4 rows under the new defaults (incl. band8 safety check)
run tools/check_b2b4.py

# (c) refresh the driver-visible bench at the shipping defaults
echo "=== bench.py ($(date +%H:%M:%S)) ===" >> "$LOG"
timeout 3000 python -u bench.py >> "$LOG" 2>&1
echo "--- rc=$? ---" >> "$LOG"

date > /tmp/r4c_battery_done
echo "R4C BATTERY DONE $(date)" >> "$LOG"
