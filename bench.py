#!/usr/bin/env python
"""Driver benchmark: JSON rows for all five configs, north-star line last.

North star (BASELINE.json:5): < 16 ms/frame at 1920x1080 over a 4096^2
heightmap with shadow rays + Phong on a v5e-8. This driver host has ONE
chip, so the measured number is single-chip ms/frame on the same workload;
vs_baseline is measured_ms / 16ms (the 8-chip target — a single chip at
<16 ms beats the baseline outright; >1.0 means slower than target).

OUTAGE-PROOF DESIGN (VERDICT r3 next #2 — round 3's evidence was zeroed
by a tunnel outage plus a fragile plan that ran B3 last with no deadlines):

  1. FRONT-DOOR PROBE: a tiny matmul in a subprocess with a hard
     deadline, retried on a bounded budget, BEFORE any config compiles.
  2. B3 FIRST among the real configs, its line printed the moment it
     lands AND re-emitted last (the driver tail-parses; if later configs
     die, the early line still exists).
  3. PER-CONFIG DEADLINES: every config runs in its own subprocess with
     a wall-time box; the subprocess persists its row to a file as soon
     as timing completes, so even a kill after measurement keeps the row.
  4. INCREMENTAL BENCH_ALL.json after every config.
  5. CPU FALLBACK: if the probe budget is exhausted (or B3 fails twice),
     B3 runs on the CPU backend at reduced scale so the round still emits
     a parseable line — clearly labeled, with a distinct metric name, so
     it can never be mistaken for a hardware number.

Budgets are env-tunable: HMRT_BENCH_PROBE_BUDGET (s, default 600),
HMRT_BENCH_TOTAL_BUDGET (s, default 2400).
"""

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
T0 = time.monotonic()

PROBE_SRC = ("import jax, jax.numpy as jnp; "
             "x = jnp.ones((128, 128)); "
             "print('PROBE_OK', float((x @ x).sum()), "
             "jax.devices()[0].platform)")

# (config, frames, reps, deadline_s, floor) — B3 leads (see module doc);
# B1 is the cheap CPU-oracle correctness row and goes last. B4's row
# carries an explicit resolution caveat: it is benchmarked at 1280x720
# (BASELINE.json:10 does not pin B4's resolution; the 1920x1080 in
# BASELINE.json:2 defines the B3/B5 schema).
# B1 runs right after B3: standalone it takes ~3 min (setup 61 s,
# frame 46 ms — measured 2026-08-19), but when it ran LAST it starved
# its deadline twice in a row (480 s!) — the tunnel degrades over a
# long serial bench session, so the cheap config goes early, not last.
_PLAN = [("B3", 4, 2, 1200, True), ("B1", 2, 1, 480, False),
         ("B2", 3, 2, 420, False),
         # B4/B5 deadlines cover the round-5 enrichment rows (B4 adds a
         # 1920x1080 measurement; B5 adds a timed 1-device-mesh sharded
         # run + an H/8 band row — VERDICT r4 next #4/#7); each extra is
         # persisted incrementally, so a deadline kill keeps everything
         # measured so far
         ("B4", 3, 1, 900, False), ("B5", 2, 1, 800, False)]


def _env():
    # PYTHONPATH trap: /root/.axon_site carries the TPU plugin; losing it
    # kills backend init. Prepend the repo, never replace the rest.
    env = dict(os.environ)
    parts = [p for p in env.get("PYTHONPATH", "").split(":") if p]
    if REPO not in parts:
        parts.insert(0, REPO)
    env["PYTHONPATH"] = ":".join(parts)
    return env


def _log(msg):
    sys.stderr.write(f"[bench +{time.monotonic() - T0:6.0f}s] {msg}\n")
    sys.stderr.flush()


def probe_backend(budget_s: float) -> bool:
    """True once a trivial device computation completes within a deadline;
    retries on a budget with sleeps (transient tunnel stalls are normal,
    multi-hour outages happen — see memory/axon-tpu-env)."""
    deadline = 120
    attempt = 0
    while True:
        attempt += 1
        left = budget_s - (time.monotonic() - T0)
        if left <= 5:
            return False
        box = min(deadline, left)
        try:
            r = subprocess.run([sys.executable, "-c", PROBE_SRC],
                               timeout=box,
                               capture_output=True, text=True, env=_env())
            if r.returncode == 0 and "PROBE_OK" in r.stdout:
                _log(f"probe ok (attempt {attempt}): {r.stdout.strip()}")
                return True
            _log(f"probe attempt {attempt} rc={r.returncode}: "
                 f"{(r.stderr or r.stdout).strip()[-200:]}")
        except subprocess.TimeoutExpired:
            _log(f"probe attempt {attempt} timed out ({box:.0f}s)")
        left = budget_s - (time.monotonic() - T0)
        if left <= 5:
            return False
        time.sleep(min(45, max(1, left - 2)))


def run_config(name, frames, reps, deadline_s, floor=False, scale=1.0,
               cpu=False):
    """One config in a subprocess with a wall-time box. Returns the row
    dict (possibly the partially-enriched one persisted before a kill),
    or None."""
    fd, out_path = tempfile.mkstemp(prefix=f"bench_{name}_", suffix=".json")
    os.close(fd)
    os.unlink(out_path)
    cmd = [sys.executable, "-m", "hmrt_tpu.bench.runner", name,
           "--frames", str(frames), "--reps", str(reps),
           "--out", out_path]
    if scale != 1.0:
        cmd += ["--scale", str(scale)]
    if floor:
        cmd += ["--floor"]
    if cpu:
        cmd += ["--cpu"]
    try:
        r = subprocess.run(cmd, timeout=deadline_s, capture_output=True,
                           text=True, env=_env())
        if r.returncode != 0:
            _log(f"{name} subprocess rc={r.returncode}: "
                 f"{(r.stderr or '').strip()[-400:]}")
    except subprocess.TimeoutExpired:
        _log(f"{name} hit its {deadline_s}s deadline; "
             "using any persisted partial row")
    try:
        with open(out_path) as f:
            row = json.load(f)
        os.unlink(out_path)
        return row
    except (OSError, ValueError):
        return None


def emit(name, row, fallback=False):
    line = {
        "metric": f"ms_per_frame_{name}",
        "value": row["ms_per_frame"],
        "unit": "ms",
        "vs_baseline": round(row["ms_per_frame"] / 16.0, 4),
        "detail": row,
    }
    if name == "B3":
        suffix = "_CPU_FALLBACK_NOT_HARDWARE" if fallback else "_1chip"
        line["metric"] = ("ms_per_frame_B3_4096sq_1920x1080_shadows_"
                          f"phong{suffix}")
    print(json.dumps(line), flush=True)
    return line


def main():
    quick = "--quick" in sys.argv
    scale = 0.25 if quick else 1.0
    probe_budget = float(os.environ.get("HMRT_BENCH_PROBE_BUDGET", "600"))
    total_budget = float(os.environ.get("HMRT_BENCH_TOTAL_BUDGET", "2400"))

    rows = []

    def save_all():
        try:
            with open(os.path.join(REPO, "BENCH_ALL.json"), "w") as f:
                json.dump(rows, f, indent=1)
        except OSError:
            pass

    backend_up = probe_backend(probe_budget)
    b3_line = None

    if not backend_up:
        _log("backend unreachable within probe budget -> CPU fallback B3 "
             "(reduced scale; clearly labeled, NOT a hardware number)")
        row = run_config("B3", 1, 1, 900, scale=0.125, cpu=True)
        if row is not None:
            row["note"] = ("TPU backend unreachable at bench time; CPU "
                           "oracle fallback at scale 0.125 — NOT "
                           "comparable to hardware rounds")
            rows.append(row)
            save_all()
            b3_line = emit("B3", row, fallback=True)
            # tail-parse lands here; nothing else to run without a device
            print(json.dumps(b3_line), flush=True)
        else:
            _log("CPU fallback also failed — no metric this round")
            sys.exit(3)
        return

    for name, frames, reps, deadline, floor in _PLAN:
        elapsed = time.monotonic() - T0
        left = total_budget - elapsed
        if left < 60:
            _log(f"total budget exhausted before {name}; stopping")
            break
        if quick:
            frames, reps = 2, 1
        box = min(deadline, left - 30) if name != "B3" else min(deadline,
                                                                left)
        row = run_config(name, frames, reps, box, floor=floor and not quick,
                         scale=scale)
        if row is None and name == "B3":
            _log("B3 attempt 1 produced no row; retrying once")
            left = total_budget - (time.monotonic() - T0)
            if left > 120:
                row = run_config(name, frames, reps, min(deadline, left),
                                 floor=not quick, scale=scale)
        if row is None:
            _log(f"{name} produced no row")
            if name == "B3":
                _log("B3 failed on hardware -> CPU fallback")
                row = run_config("B3", 1, 1, 900, scale=0.125, cpu=True)
                if row is None:
                    sys.exit(3)
                row["note"] = ("B3 failed on the device backend; CPU "
                               "oracle fallback at scale 0.125 — NOT "
                               "comparable to hardware rounds")
                rows.append(row)
                save_all()
                b3_line = emit("B3", row, fallback=True)
            continue
        if name == "B4":
            row["resolution_note"] = (
                "B4 measured at 1280x720; BASELINE.json:10 does not pin a "
                "resolution (1080p would be ~2.2x this ms/frame)")
        rows.append(row)
        save_all()
        line = emit(name, row)
        if name == "B3":
            b3_line = line

    # re-emit the north-star line LAST so a tail-parse lands on it
    if b3_line is not None:
        print(json.dumps(b3_line), flush=True)
    else:
        sys.exit(3)


if __name__ == "__main__":
    main()
