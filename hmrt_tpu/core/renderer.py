"""Reference renderer: pure-JAX, jit-able, backend-agnostic (SURVEY.md C20).

The reference ships a scalar CPU renderer whose images are the fidelity
oracle for the CUDA kernel (BASELINE.json:5 "identical intersection fidelity
versus CPU reference images"; BASELINE.json:7 "CPU reference render"). Here
the oracle is a fully vectorized jnp pipeline: raygen -> masked-wavefront
march -> shading -> Frame. It runs unchanged on the CPU backend (tests) and
on TPU (it is also the production path for pyramids too large for a
VMEM-resident Pallas kernel), and it is the correctness spec the Pallas
kernel is tested against (tests/test_pallas_kernel.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from hmrt_tpu.config import RenderConfig
from hmrt_tpu.shading import shade as sh
from hmrt_tpu.traversal.march import BIG_T, march_dda, march_maxmip
from hmrt_tpu.types import Camera, Frame, Scene

SHADOW_EPS = 1e-2


def render_frame(scene: Scene, camera: Camera, config: RenderConfig) -> Frame:
    """Render one frame (SURVEY.md section 3.2).

    Backend dispatch (config.backend):
      "pallas": the fused brick-marching tile kernel (kernels/raycast.py);
      "compact": budgeted march passes with periodic ray compaction
                (kernels/compact.py) — fastest on large maps, where
                screen tiles diverge across many terrain columns;
      "oracle": the pure-XLA wavefront pipeline below — the fidelity spec,
                runs on any backend, and the fallback for scenes too small
                to brick;
      "auto":   compact for maps >= 1024^2, else the fused kernel, when
                the scene is packed and a TPU is present (measured at the
                shipped defaults: B3 fused 4.43 s vs compact 2.66 s; B2
                1024^2 fused 328 ms vs compact 304 ms).
    """
    interpret = jax.default_backend() != "tpu"
    if config.backend in ("pallas", "compact") and scene.packed is None:
        # an explicitly requested kernel path must not silently downgrade
        # to the (~16x slower) oracle — a benchmark would measure the
        # wrong thing; use make_scene(pack=True) or backend="auto"
        raise ValueError(
            f"backend={config.backend!r} requested but the scene is not "
            "brick-packed (scene.packed is None); build it with "
            "make_scene(..., pack=True) or use backend='auto'")
    use_compact = (config.backend == "compact"
                   or (config.backend == "auto"
                       and scene.packed is not None
                       and scene.m >= 1024
                       and jax.default_backend() == "tpu"))
    if use_compact:
        from hmrt_tpu.kernels.compact import render_frame_compact
        return render_frame_compact(scene, scene.packed, camera, config,
                                    interpret=interpret)
    use_pallas = (config.backend == "pallas"
                  or (config.backend == "auto"
                      and scene.packed is not None
                      and jax.default_backend() == "tpu"))
    if use_pallas:
        from hmrt_tpu.kernels.raycast import render_frame_pallas
        return render_frame_pallas(scene, scene.packed, camera, config,
                                   interpret=interpret)
    return render_frame_oracle(scene, camera, config)


@partial(jax.jit, static_argnames=("config",))
def render_frame_oracle(scene: Scene, camera: Camera,
                        config: RenderConfig) -> Frame:
    """The pure-XLA oracle pipeline (reference renderer, SURVEY.md C20)."""
    H, W = config.height, config.width
    eye, dirs = camera.rays(H, W)
    d = dirs.reshape(-1, 3)
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    P = dx.shape[0]
    ox = jnp.broadcast_to(eye[0], (P,))
    oy = jnp.broadcast_to(eye[1], (P,))
    oz = jnp.broadcast_to(eye[2], (P,))

    heights_flat = scene.heights.reshape(-1)
    n = scene.n
    max_steps = config.steps_for(scene.n_cells)

    if config.traversal == "dda":
        res = march_dda(ox, oy, oz, dx, dy, dz, heights_flat,
                        n=n, max_steps=max_steps,
                        cell_intersect=config.cell_intersect,
                        clip=config.clip_box)
    else:
        res = march_maxmip(ox, oy, oz, dx, dy, dz, scene.pyr_flat,
                           heights_flat, n=n, m=scene.m, levels=scene.levels,
                           max_steps=max_steps,
                           cell_intersect=config.cell_intersect,
                           clip=config.clip_box)

    color, depth, normal = shade_hits(scene, config, ox, oy, oz, dx, dy, dz,
                                      res.hit, res.t)

    frame = Frame(
        color=color.reshape(H, W, 3),
        depth=depth.reshape(H, W) if config.aux_buffers else None,
        normal=normal.reshape(H, W, 3) if config.aux_buffers else None,
        hit=res.hit.reshape(H, W),
    )
    return frame


def shade_hits(scene: Scene, config: RenderConfig,
               ox, oy, oz, dx, dy, dz, hit, t):
    """Shade a batch of march results -> (color[P,3], depth[P], normal[P,3]).

    Shared by the oracle and (re-traced per tile) by the Pallas path.
    """
    heights_flat = scene.heights.reshape(-1)
    n = scene.n
    light = scene.light
    lx, ly, lz = light.sun_dir[0], light.sun_dir[1], light.sun_dir[2]

    ts = jnp.where(hit, t, 0.0)
    px = ox + ts * dx
    py = oy + ts * dy
    pz = oz + ts * dz

    nx, ny, nz = sh.gradient_normal(heights_flat, n, px, py)

    # --- direct lighting ---
    diff = sh.lambert(nx, ny, nz, lx, ly, lz)

    if config.shadows:
        # second masked march toward the sun, any-hit (SURVEY.md C17)
        sx = px + lx * SHADOW_EPS + nx * SHADOW_EPS
        sy = py + ly * SHADOW_EPS + ny * SHADOW_EPS
        sz = pz + lz * SHADOW_EPS + nz * SHADOW_EPS
        # the shadow march is always max-mip, so its step cap must use the
        # max-mip formula even when config.traversal == "dda" (whose 4*N cap
        # has no slack for descend/ascend overhead: grazing shadow rays
        # could hit the cap and be silently reported unoccluded)
        shadow_cap = config.max_steps or (8 * scene.n_cells + 256)
        occ = march_maxmip(
            jnp.where(hit, sx, -1e6), jnp.where(hit, sy, -1e6), sz,
            jnp.broadcast_to(lx, px.shape), jnp.broadcast_to(ly, px.shape),
            jnp.broadcast_to(lz, px.shape),
            scene.pyr_flat, heights_flat,
            n=n, m=scene.m, levels=scene.levels,
            max_steps=shadow_cap,
            cell_intersect=config.cell_intersect, any_hit=True).hit
        diff = jnp.where(occ, 0.0, diff)

    if config.texture and scene.albedo is not None:
        alb = scene.albedo  # stored (3, N*N) planar
        ar, ag, ab = sh.sample_albedo(alb, n, px, py)
    else:
        ar = ag = ab = jnp.full_like(px, 0.55)

    amb = config.ambient
    sr, sg, sb = light.sun_color[0], light.sun_color[1], light.sun_color[2]
    r = ar * (amb + diff * sr)
    g = ag * (amb + diff * sg)
    b = ab * (amb + diff * sb)

    if config.shading == "phong":
        spec = sh.phong_specular(nx, ny, nz, lx, ly, lz,
                                 -dx, -dy, -dz, config.shininess)
        if config.shadows:
            spec = jnp.where(occ, 0.0, spec)
        ks = config.specular
        r = r + ks * spec * sr
        g = g + ks * spec * sg
        b = b + ks * spec * sb

    if config.fog:
        r, g, b = sh.apply_fog(r, g, b, ts, config.fog_density,
                               light.fog_color)

    skyr, skyg, skyb = sh.sky_color(dz, light.sky_top, light.sky_horizon)
    r = jnp.where(hit, r, skyr)
    g = jnp.where(hit, g, skyg)
    b = jnp.where(hit, b, skyb)

    color = jnp.stack([r, g, b], axis=-1)
    depth = jnp.where(hit, t, jnp.inf)
    normal = jnp.stack([jnp.where(hit, nx, 0.0),
                        jnp.where(hit, ny, 0.0),
                        jnp.where(hit, nz, 0.0)], axis=-1)
    return jnp.clip(color, 0.0, 1.0), depth, normal
