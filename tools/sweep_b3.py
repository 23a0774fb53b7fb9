#!/usr/bin/env python
"""Compaction-schedule sweep for the B3 workload on real hardware.

Usage:
    python tools/sweep_b3.py [--map 4096] [--schedules "0,2,512,4,8 0,2,512,8,8"]

Each schedule is first_budget,rounds,round_budget,n_col where n_col is an
int or a per-pass colon list (pass0:round1:...:final), e.g. 0,2,512,4:4:2.
Timing follows bench/timing.py's hazards: salted camera per rep + scalar
value fetch (the tunnel dedups identical dispatches / reports early).
"""
import argparse
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--map", type=int, default=4096)
    ap.add_argument("--res", default="1920x1080")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--schedules",
                    default="0,2,512,4")
    args = ap.parse_args()

    from hmrt_tpu.api.scene import make_scene
    from hmrt_tpu.bench.configs import BENCH_CONFIGS
    from hmrt_tpu.io.heightmap import procedural_terrain
    from hmrt_tpu.kernels.compact import render_frame_compact
    from hmrt_tpu.types import Camera
    import dataclasses

    w, h = (int(v) for v in args.res.split("x"))
    cfg = dataclasses.replace(BENCH_CONFIGS["B3"].render, width=w, height=h)
    n = args.map
    terr = procedural_terrain(n, seed=3)
    scene = make_scene(terr)
    zmax = float(terr.max())
    cam0 = Camera.create(eye=(n * 0.5, -n * 0.25, zmax + n * 0.06),
                         target=(n * 0.5, n * 0.5, float(terr.mean())),
                         fov_y_deg=55.0)

    def run(sched, salt, prefixes=None, spref=None):
        # grammar (r5): fb,r,rb,nc,l0,unroll,sub,band,sdir,relax
        # [,banks[,coarse0[,sortm]]].  coarse0: -1 = None (full pass-0
        # descent), 0 = skip pass 0 (entry-column round-0 sort), k>0 =
        # shallow cap.  sortm: 0 = argsort+row-gather, 1 = payload sort.
        # Reject anything longer: the retired pre-r4 batteries used a
        # 13-field grammar whose strings misparse here (e.g. unroll=0 =>
        # infinite while_loop) — ADVICE r4 #1.
        if len(sched) > 14:
            raise ValueError(f"schedule has {len(sched)} fields; the "
                             "current grammar is fb,r,rb,nc,l0,unroll,"
                             "sub,band,sdir,relax[,banks[,coarse0"
                             "[,sortm[,foldinv]]]]")
        fb, r, rb, nc = sched[:4]
        # 0=off, 1=on, 2=adaptive ("auto")
        l0 = ([False, True, "auto"][int(sched[4])]
              if len(sched) > 4 else False)
        unroll = int(sched[5]) if len(sched) > 5 else 1
        sub = bool(sched[6]) if len(sched) > 6 else False
        band = int(sched[7]) if len(sched) > 7 else 0
        sdir = int(sched[8]) if len(sched) > 8 else 0
        relax = int(sched[9]) if len(sched) > 9 else 0
        banks = int(sched[10]) if len(sched) > 10 else 1
        c0 = int(sched[11]) if len(sched) > 11 else -1
        coarse0 = None if c0 < 0 else c0
        sortm = int(sched[12]) if len(sched) > 12 else 4
        foldinv = bool(int(sched[13])) if len(sched) > 13 else False
        cam = Camera(eye=cam0.eye + salt, target=cam0.target, up=cam0.up,
                     fov_y=cam0.fov_y)
        if isinstance(nc, tuple) and len(nc) == 1:
            nc = nc[0]
        fr = render_frame_compact(scene, scene.packed, cam, cfg,
                                  first_budget=fb, rounds=r,
                                  round_budget=rb, n_col=nc, l0_tail=l0,
                                  unroll=unroll,
                                  subserve=sub, band_tail=band,
                                  round_prefixes=prefixes,
                                  shadow_prefixes=spref,
                                  sort_dir=sdir,
                                  relax=relax, banks=banks,
                                  coarse0=coarse0, sort_mode=sortm,
                                  fold_inv=foldinv)
        return float(jnp.sum(fr.color[::16, ::16]))

    P = -(-w * h // 1024) * 1024

    for stxt in args.schedules.split():
        # schedule grammar: "<fields>[/<prefix divisors>[/<shadow divs>]]"
        # e.g. 0,4,256,3,2,8,1,8/1,2,4,4/1,4 — round r sorts and
        # marches only the first P//div_r rays (kernels/compact.py
        # round_prefixes); rounds is overridden by the divisor count.
        parts_txt = stxt.split("/")
        prefixes = (tuple(P // int(d) for d in parts_txt[1].split(","))
                    if len(parts_txt) > 1 and parts_txt[1] else None)
        spref = (tuple(P // int(d) for d in parts_txt[2].split(","))
                 if len(parts_txt) > 2 and parts_txt[2] else None)
        sched = tuple(
            tuple(int(x) for x in v.split(":")) if ":" in v else int(v)
            for v in parts_txt[0].split(","))
        try:
            run(sched, jnp.zeros(3, jnp.float32), prefixes, spref)  # compile
            times = []
            for rep in range(1, args.reps + 1):
                salt = jnp.asarray([rep * 1e-4, -rep * 1e-4, rep * 1e-4],
                                   jnp.float32)
                t0 = time.perf_counter()
                run(sched, salt, prefixes, spref)
                times.append((time.perf_counter() - t0) * 1e3)
            times.sort()
            print(f"{stxt}: {times[len(times)//2]:.0f} ms  (all: "
                  f"{[f'{t:.0f}' for t in times]})", flush=True)
        except Exception as e:
            print(f"{stxt}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
