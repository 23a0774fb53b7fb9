#!/usr/bin/env python
"""Fast on-hardware exactness check: compact + fused kernels vs the oracle.

Renders a shadows+Phong scene on a modest map and asserts hit masks, hit
cells, and hit t agree with the oracle bit-for-bit (t within f32 identity).
CI covers this in interpret mode (tests/); this script gives the same
signal in seconds on the real chip after kernel changes.
"""
import sys

import numpy as np

import hmrt_tpu as H
from hmrt_tpu.config import RenderConfig
from hmrt_tpu.core.renderer import render_frame_oracle
from hmrt_tpu.kernels.compact import render_frame_compact
from hmrt_tpu.kernels.raycast import render_frame_pallas


def check(name, fr, fo):
    hit_k = np.asarray(fr.hit)
    hit_o = np.asarray(fo.hit)
    mm = (hit_k != hit_o).sum()
    d_k = np.asarray(fr.depth)
    d_o = np.asarray(fo.depth)
    both = hit_k & hit_o
    dt = np.abs(np.where(both, d_k - d_o, 0.0)).max()
    col = np.abs(np.asarray(fr.color) - np.asarray(fo.color)).max()
    print(f"{name}: hit mismatches={mm}  max|dt|={dt:.3e}  "
          f"max|dcolor|={col:.3e}", flush=True)
    return mm == 0 and dt < 1e-4 and col < 1e-4


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    terr = H.procedural_terrain(n, seed=7)
    scene = H.make_scene(terr)
    zmax = float(terr.max())
    cam = H.Camera.create(eye=(n * 0.5, -n * 0.25, zmax + n * 0.06),
                          target=(n * 0.5, n * 0.5, float(terr.mean())),
                          fov_y_deg=55.0)
    cfg = RenderConfig(width=256, height=256, traversal="maxmip",
                       shading="phong", shadows=True, aux_buffers=True)
    fo = render_frame_oracle(scene, cam, cfg)
    ok = check("compact", render_frame_compact(scene, scene.packed, cam, cfg),
               fo)
    ok &= check("pallas ", render_frame_pallas(scene, scene.packed, cam, cfg),
                fo)
    print("OK" if ok else "MISMATCH", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
