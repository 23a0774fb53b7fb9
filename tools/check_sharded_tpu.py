#!/usr/bin/env python
"""Run the SHARDED render paths on the real TPU with a 1-device mesh.

The CPU-mesh CI (tests/test_sharded.py) proves the shard_map logic and
collectives on 8 virtual devices; what it cannot prove is that Mosaic
compiles the kernels inside the sharded program shape on real hardware
(interpret mode hides several known hazards — BENCH_NOTES.md "Platform
hazards"). This runs both sharding strategies over a mesh of the one
attached chip and pixel-checks against the unsharded render:

  - band path: render_frame_sharded at the compact backend (1024^2 map)
  - frame-axis DP: render_flythrough_sharded, 4 frames, scan-of-compact

Passes == the multi-chip program only lacks chips, not correctness.
"""

import json
import time

import numpy as np


def main():
    import argparse

    import hmrt_tpu as H
    from hmrt_tpu.api.flythrough import frame_camera, orbit_flythrough
    from hmrt_tpu.distrib.mesh import (make_mesh, render_flythrough_sharded,
                                       render_frame_sharded, replicate_scene)

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=192)
    args = ap.parse_args()

    n = args.size
    terr = H.procedural_terrain(n, seed=3)
    scene = H.make_scene(terr)
    zmax, zmean = float(terr.max()), float(terr.mean())
    cam = H.Camera.create(eye=(n * 0.5, -n * 0.25, zmax + n * 0.06),
                          target=(n * 0.5, n * 0.5, zmean))
    cfg = H.RenderConfig(width=args.width, height=args.height,
                         shading="phong", shadows=True, backend="compact")

    t0 = time.time()
    ref = H.render_frame(scene, cam, cfg)
    ref_color = np.asarray(ref.color)

    # band path (1-device mesh): same program family as the 8-chip B5 run
    mesh = make_mesh()
    sc = replicate_scene(scene, mesh)
    fr = render_frame_sharded(sc, cam, cfg, mesh)
    band_color = np.asarray(fr.color)
    band_hit_ok = bool((np.asarray(fr.hit) == np.asarray(ref.hit)).all())
    band_max = float(np.abs(band_color - ref_color).max())

    # frame-axis DP: 4 frames scanned on-device, frame 2 spot-checked
    fmesh = make_mesh(axis_name="frames")
    cams = orbit_flythrough(n, zmax, 4)
    stack = np.asarray(render_flythrough_sharded(sc, cams, cfg, fmesh))
    ref2 = H.render_frame(scene, frame_camera(cams, 2), cfg)
    fly_max = float(np.abs(stack[2] - np.asarray(ref2.color)).max())

    ok = band_hit_ok and band_max < 1e-4 and fly_max < 1e-4
    print(json.dumps({
        "check": "sharded_paths_on_tpu", "devices": mesh.devices.size,
        "band_hit_exact": band_hit_ok,
        "band_color_maxdiff": band_max, "fly_color_maxdiff": fly_max,
        "wall_s": round(time.time() - t0, 1), "ok": ok,
    }), flush=True)
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
