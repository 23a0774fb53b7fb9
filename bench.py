#!/usr/bin/env python
"""Driver benchmark: one JSON line for the north-star config.

North star (BASELINE.json:5): < 16 ms/frame at 1920x1080 over a 4096^2
heightmap with shadow rays + Phong on a v5e-8. This driver host has ONE
chip, so the measured number is single-chip ms/frame on the same workload;
vs_baseline is measured_ms / 16ms (the 8-chip target — a single chip at
<16 ms beats the baseline outright; >1.0 means slower than target).
"""

import json
import sys


def main():
    frames = 4
    scale = 1.0
    if "--quick" in sys.argv:
        frames, scale = 2, 0.25

    from hmrt_tpu.bench.runner import run_bench

    # the remote-TPU tunnel occasionally drops mid-run; one retry keeps the
    # driver's metric line flowing (observed: compile-server broken pipe,
    # transient worker restarts)
    try:
        row = run_bench("B3", frames=frames, scale=scale, reps=2)
    except Exception as e:
        sys.stderr.write(f"bench attempt 1 failed ({type(e).__name__}); "
                         "retrying once\n")
        row = run_bench("B3", frames=frames, scale=scale, reps=2)
    out = {
        "metric": "ms_per_frame_B3_4096sq_1920x1080_shadows_phong_1chip",
        "value": row["ms_per_frame"],
        "unit": "ms",
        "vs_baseline": round(row["ms_per_frame"] / 16.0, 4),
        "detail": row,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
