#!/usr/bin/env python
"""Full-scale retest of the while/scan-around-pallas_call hazard.

tools/repros/while_of_pallas.py (small shapes) PASSES on jax 0.9.0, but
the original miscompile/worker-crash appeared only on LARGE scenes
(BENCH_NOTES.md platform hazards), so the workarounds (python-unrolled
resort rounds, host-loop animation timing) stay until THIS test — the
real compact renderer inside lax.scan at benchmark scale — passes on
hardware.

Usage: python tools/repros/scan_of_compact_fullscale.py [--map 1024]
       [--res 1024x768] [--frames 3] [--shadows]

Compares the lax.scan checksum against the host-loop checksum. The scan
accumulates in f32 on device while the host loop accumulates in python
float64, so agreement is to f32 rounding (rel 1e-5) — the hazard being
retested is gross corruption / worker crash, not ulps.
"""
import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--map", type=int, default=1024)
    ap.add_argument("--res", default="1024x768")
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--shadows", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp

    from hmrt_tpu.api.scene import make_scene
    from hmrt_tpu.api.flythrough import orbit_flythrough
    from hmrt_tpu.bench.timing import _loop_frames, _scan_frames
    from hmrt_tpu.config import RenderConfig
    from hmrt_tpu.io.heightmap import procedural_terrain

    w, h = (int(v) for v in args.res.split("x"))
    cfg = RenderConfig(width=w, height=h, shading="phong",
                       shadows=args.shadows, backend="compact")
    terr = procedural_terrain(args.map, seed=3)
    scene = make_scene(terr)
    cams = orbit_flythrough(args.map, float(terr.max()), args.frames)
    salt = jnp.asarray([1e-4, -1e-4, 1e-4], jnp.float32)

    loop = _loop_frames(scene, cams, salt, cfg, args.frames)
    print(f"host-loop checksum: {loop!r}", flush=True)
    scan = float(_scan_frames(scene, cams, salt, cfg, args.frames))
    print(f"lax.scan checksum:  {scan!r}", flush=True)
    rel = abs(scan - loop) / max(abs(loop), 1e-6)
    if rel < 1e-5:
        print(f"PASS: scan-of-pallas matches host loop at full scale "
              f"(rel {rel:.2e})")
    else:
        print(f"FAIL: checksums differ (rel {rel:.2e})")
        raise SystemExit(1)


if __name__ == "__main__":
    main()
