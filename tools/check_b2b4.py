#!/usr/bin/env python
"""Spot-check B2/B4 frames under compact-schedule variants.

The B3-tuned schedule (l0_tail + subserve) must not regress the
pyramid-friendly orbit views: l0_tail forces every surviving ray to
level 0 for the final round, which measured 706 -> 1564 ms on B4 under
block-global serving (BENCH_NOTES round-2). This re-measures under
subserve so the production defaults can be chosen on data.

CAMERAS = the driver protocol's (VERDICT r4 weak #3 — one camera per
config, everywhere): B2 uses bench_scene's static camera, B4 the first
orbit_flythrough frames, exactly what hmrt_tpu.bench.runner times. Rows
printed here are directly comparable to BENCH_ALL.json (same workload,
minus the runner's scan amortization — expect a few ms of per-dispatch
overhead on top).

Usage: python tools/check_b2b4.py [--which b2 b4]
Each row: config, schedule knobs, median per-frame ms over reps.
"""
import argparse
import dataclasses
import time

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", nargs="*", default=["b2", "b4"])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--frames", type=int, default=3,
                    help="orbit frames per rep for animated configs "
                         "(the driver plan times 3)")
    args = ap.parse_args()

    from hmrt_tpu.api.flythrough import frame_camera, orbit_flythrough
    from hmrt_tpu.bench.configs import BENCH_CONFIGS, bench_scene
    from hmrt_tpu.kernels.compact import render_frame_compact
    from hmrt_tpu.types import Camera

    variants = [
        # label, kwargs (production defaults = whatever compact.py ships;
        # since the r4 battery that means auto prefixes + shadow prefixes)
        ("defaults", {}),
        ("banks=1", {"banks": 1}),
        ("banks=2", {"banks": 2}),
        ("r3-defaults(no-prefix)", {"round_prefixes": None,
                                    "shadow_prefixes": None, "rounds": 2}),
        ("l0_tail=False", {"l0_tail": False}),
        ("band8", {"band_tail": 8}),
        ("band8+l0_tail=True", {"band_tail": 8, "l0_tail": True}),
    ]

    for which in args.which:
        bc = BENCH_CONFIGS[which.upper()]
        scene, cam0, terr = bench_scene(bc)
        n = bc.map_n
        zmax = float(terr.max())
        P = -(-bc.render.height * bc.render.width // 1024) * 1024
        variants_w = variants + [
            ("prefix/1,2,4,4", {"round_prefixes": (P, P // 2, P // 4,
                                                   P // 4)}),
            ("sort_dir=1", {"sort_dir": 1}),
        ]
        cfg = dataclasses.replace(bc.render, backend="compact")
        if bc.animated:
            cams = orbit_flythrough(n, zmax, args.frames)
            frames = [frame_camera(cams, i) for i in range(args.frames)]
        else:
            frames = [cam0]
        for label, kw in variants_w:
            def run(salt):
                acc = 0.0
                for cf in frames:
                    cam = Camera(eye=cf.eye + salt, target=cf.target,
                                 up=cf.up, fov_y=cf.fov_y)
                    fr = render_frame_compact(scene, scene.packed, cam,
                                              cfg, **kw)
                    acc += float(jnp.sum(fr.color[::16, ::16]))
                return acc
            try:
                run(jnp.zeros(3, jnp.float32))
                times = []
                for rep in range(1, args.reps + 1):
                    salt = jnp.asarray([rep * 1e-4] * 3, jnp.float32)
                    t0 = time.perf_counter()
                    run(salt)
                    times.append((time.perf_counter() - t0) * 1e3
                                 / len(frames))
                times.sort()
                print(f"{which} {label}: {times[len(times)//2]:.0f} "
                      f"ms/frame (all {[f'{t:.0f}' for t in times]})",
                      flush=True)
            except Exception as e:
                print(f"{which} {label}: FAILED {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
