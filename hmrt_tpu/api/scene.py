"""Scene construction: load heights, build pyramid, upload (SURVEY.md 3.1).

Reference startup: load heightmap -> upload to device -> build mip pyramid
on device -> camera init (SURVEY.md section 3.1). TPU equivalent: one
`device_put` of the height grid (replicated across the mesh in the
multi-chip path — hmrt_tpu.distrib) and a jitted pyramid build; everything
stays HBM-resident across frames (BASELINE.json:5).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from hmrt_tpu.core.pyramid import build_pyramid_flat, next_pow2, num_levels
from hmrt_tpu.types import Light, Scene


def make_scene(heights, albedo=None, light: Light | None = None,
               device=None, pack: bool | None = None) -> Scene:
    """Build a device-resident Scene from an (N, N) height grid.

    `albedo` is an optional (N, N, 3) float [0,1] texture (SURVEY.md C18),
    stored planar (3, N*N) for single-channel gathers.
    """
    heights = jnp.asarray(np.asarray(heights, np.float32))
    if heights.ndim != 2 or heights.shape[0] != heights.shape[1]:
        raise ValueError(f"heights must be square (N, N), got {heights.shape}")
    n = int(heights.shape[0])
    if n < 2:
        raise ValueError("heightmap must be at least 2x2")
    m = next_pow2(n - 1)
    levels = num_levels(m)
    if device is not None:
        heights = jax.device_put(heights, device)
    pyr = build_pyramid_flat(heights)
    alb = None
    if albedo is not None:
        a = np.asarray(albedo, np.float32)
        if a.shape != (n, n, 3):
            raise ValueError(f"albedo must be (N, N, 3), got {a.shape}")
        alb = jnp.asarray(a.reshape(n * n, 3).T.copy())  # (3, N*N) planar
        if device is not None:
            alb = jax.device_put(alb, device)
    scene = Scene(heights=heights, pyr_flat=pyr, albedo=alb,
                  light=light if light is not None else Light.create(),
                  packed=None, n=n, m=m, levels=levels)
    if pack and m < 64:
        raise ValueError(
            "pack=True cannot be honored: the brick kernel needs a padded "
            f"cell grid of >= 64 (heightmap >= 66 samples); got M={m}. "
            "Pass pack=False/None to use the oracle path for small scenes.")
    if pack is None:
        pack = m >= 64   # brick kernel needs >= 2x2 bricks of 32 cells
    if pack:
        from hmrt_tpu.kernels.packing import pack_scene
        import dataclasses
        scene = dataclasses.replace(scene, packed=pack_scene(scene))
    return scene
