#!/bin/bash
# Round-3 hardware measurement battery: run serially (one TPU process at
# a time — the axon tunnel contends) as soon as the tunnel is back.
# Usage: bash tools/r3_battery.sh [logfile]
set -u
LOG=${1:-/tmp/r3_battery.log}
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout 2400 python -u "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}

: > "$LOG"

# 1) phase anatomy at the shipping defaults (alive trajectory per round
#    feeds the prefix-schedule design)
run tools/diag_b3.py --sched 0,2,256,3,1,0,0,0,8,1

# 2) prefix-sliced schedules vs the current default (control first)
run tools/sweep_b3.py --reps 3 --schedules "\
0,2,256,3,2,0,0,0,8,1 \
0,4,256,3,2,0,0,0,8,1/1,2,4,4 \
0,6,256,3,2,0,0,0,8,1/1,2,4,4,4,4 \
0,6,512,3,2,0,0,0,8,1/1,2,4,4,4,4 \
0,8,256,3,2,0,0,0,8,1/1,2,4,4,4,4,4,4"

# 3) band-8 tail (2-chunk corner scan) with and without prefixes; nb sweep
run tools/sweep_b3.py --reps 3 --schedules "\
0,2,256,3,1,0,0,0,8,1,8 \
0,2,256,4,1,0,0,0,8,1,8 \
0,6,256,3,1,0,0,0,8,1,8/1,2,4,4,4,4 \
0,6,256,4,1,0,0,0,8,1,8/1,2,4,4,4,4"

# 4) shadow prefixes on a mid-size prefix schedule
run tools/sweep_b3.py --reps 3 --schedules "\
0,6,256,3,2,0,0,0,8,1/1,2,4,4,4,4/1,4 \
0,6,256,3,2,0,0,0,8,1/1,2,4,4,4,4/1,2"

# 5) pass-0 fusion via entry-cell sort (field 12), alone and with prefixes
run tools/sweep_b3.py --reps 3 --schedules "\
0,2,256,3,2,0,0,0,8,1,0,1 \
0,6,256,3,2,0,0,0,8,1,0,1/1,2,4,4,4,4"

# 5b) direction-octant resort keys (field 13): subordinate (1) and
#     octant-major (2), on the default schedule and a prefix schedule
run tools/sweep_b3.py --reps 3 --schedules "\
0,2,256,3,2,0,0,0,8,1,0,0,1 \
0,2,256,3,2,0,0,0,8,1,0,0,2 \
0,6,256,3,2,0,0,0,8,1,0,0,1/1,2,4,4,4,4"

# 5c) combined candidates: the likely default is some union of prefix
#     rounds, band-8 tail, entry sort and sort_dir — measure the
#     combinations directly so defaults aren't chosen by extrapolation
run tools/sweep_b3.py --reps 3 --schedules "\
0,6,256,3,1,0,0,0,8,1,8,0,1/1,2,4,4,4,4 \
0,6,256,3,2,0,0,0,8,1,0,1,1/1,2,4,4,4,4 \
0,6,256,3,1,0,0,0,8,1,8,1,1/1,2,4,4,4,4"

# 6) B2/B4 regression check of the candidate defaults
run tools/check_b2b4.py

# 6b) survivor level-mix anatomy on the l0_tail auto-mispredict regime
#     (8192^2 map, static oblique camera, B4 resolution): calibrates
#     L0_TAIL_AUTO_THRESH against the forced-tail 2x loss there
run tools/diag_b3.py --map 8192 --res 1280x720 --cam oblique \
    --sched 0,2,256,3,0,0,0,0,8,1

# 7) out-of-core B4-scale frame time (VERDICT r2 next #5): 8192^2 raw
#    mmap, 2048-cell tiles, culled, with shadows; rep 0 cold, rep 1 warm
#    through the 16-tile scene cache
run tools/bench_ooc.py --reps 2 --shadows --cache 16

# 8) sharded program shapes compiled by Mosaic on the real chip
#    (1-device mesh): band path + frame-axis DP vs unsharded
run tools/check_sharded_tpu.py

# 9) the on-hardware test suite (kernel paths compiled by Mosaic, not the
#    interpreter; ~8 min in session 3) — revalidates after this round's
#    changes. test_sharded stays CPU-mesh-only (1 real chip).
export HMRT_TEST_TPU=1
run -m pytest tests/ -q --deselect tests/test_sharded.py -p no:cacheprovider
unset HMRT_TEST_TPU

echo "BATTERY DONE $(date)" >> "$LOG"
