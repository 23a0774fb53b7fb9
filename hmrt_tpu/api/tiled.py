"""Out-of-core tiled rendering for maps larger than device memory (C5).

The reference handles 8192^2-class maps as tiles (BASELINE.json:10 "8192^2
tiled heightmap"). When the whole map (and its brick pack) fits in HBM the
resident path is fastest and is what the B4 benchmark measures; this module
is the capability for maps that do NOT fit: the map is streamed tile by
tile (from a RawTileMap mmap or an in-memory array), each tile becomes a
temporary sub-scene, the FULL frame is rendered against each sub-scene with
the camera translated into tile-local coordinates, and the per-tile frames
are composited by nearest hit depth.

Exactness: every heightfield cell belongs to exactly one tile (tiles carry
a one-sample overlap so each cell's 4 corner samples are tile-local), the
per-cell intersection math is identical, and min-depth compositing selects
the globally nearest hit — so the composite is pixel-identical to a
monolithic render of the same map (tests/test_tiled.py).

Shadows: a shadow ray's occluder may live in a different tile than the
hit, so shadowed colors cannot be composited per tile. Instead the
shadowed path runs in three stages: (1) the per-tile GEOMETRY composite
above (hit, t, normal) with shading deferred; (2) a second tile sweep
marching every shadow ray clipped to that tile's cell window (any-hit,
same SHADOW_EPS origin offset as the resident path) and OR-ing the
occlusion — cells partition across tiles with bit-identical corners, so
the union equals the monolithic shadow march hit-for-hit; (3) one global
XLA shading pass replicating core.renderer.shade_hits (Lambert/Phong,
fog, sky) from the composited geometry, with albedo sampled from the
caller's full albedo array. B4 — the tiled benchmark config — remains
texture+fog without shadows (BASELINE.json:10); shadowed out-of-core
frames pay a second streaming sweep.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from hmrt_tpu.api.scene import make_scene
from hmrt_tpu.config import RenderConfig
from hmrt_tpu.core.renderer import render_frame
from hmrt_tpu.types import Camera, Frame, Light


def _tile_axis(side: int, tile: int):
    """Tile origins along one axis. Every tile spans exactly `tile` cells
    (tile+1 samples): a non-aligned final tile is SHIFTED back to overlap
    its neighbor rather than shrunk — overlapped cells are bit-identical
    duplicates, so min-depth compositing stays exact, and no tile ever
    contains fabricated cells beyond the map edge."""
    n_cells = side - 1
    if n_cells <= tile:
        return [0]
    xs = list(range(0, n_cells - tile, tile))
    xs.append(n_cells - tile)
    return xs


def _tile_origins(side: int, tile: int):
    for y0 in _tile_axis(side, tile):
        for x0 in _tile_axis(side, tile):
            yield y0, x0


def render_frame_tiled(source, camera: Camera, config: RenderConfig, *,
                       tile: int = 2048, light: Light | None = None,
                       albedo: np.ndarray | None = None) -> Frame:
    """Render one frame against a tiled heightmap source.

    source: an (N, N) float32 array in world z units, or any object with
    `.side` and `.tile(y0, x0, th, tw) -> np.ndarray` (e.g.
    hmrt_tpu.io.native.RawTileMap for an mmap'd raw-f32 file).
    `tile` is the cell count per tile edge (a tile loads tile+1 samples).
    """
    if isinstance(source, np.ndarray):
        side = source.shape[0]

        def fetch(y0, x0, th, tw):
            ys = np.clip(np.arange(y0, y0 + th), 0, side - 1)
            xs = np.clip(np.arange(x0, x0 + tw), 0, side - 1)
            return np.asarray(source[np.ix_(ys, xs)], np.float32)
    else:
        side = source.side
        fetch = source.tile

    H, W = config.height, config.width
    n_cells = side - 1
    t_cells = min(tile, n_cells)
    # Sub-scenes carry a one-sample margin on every edge so gradient
    # normals at tile seams read the true neighbor samples (fetch clamps
    # at the map border — exactly the monolithic border clamping). The
    # march is clipped to the interior cell window [1, 1 + t_cells] so the
    # margin's duplicate/virtual cells are never tested.
    # Shadowed frames defer ALL shading to the global stage-3 pass, so the
    # per-tile renders drop shadows (occlusion is stage 2's job).
    sub_cfg = dataclasses.replace(config, aux_buffers=True, shadows=False,
                                  clip_box=(1.0, 1.0 + t_cells))

    def load_tile(y0, x0, with_albedo):
        n_sub = t_cells + 3  # tile samples + 1 margin sample per edge
        heights = np.array(fetch(y0 - 1, x0 - 1, n_sub, n_sub))
        # Off-map margin lines (clamped duplicates) are linearly
        # extrapolated so border-cell gradients match the monolithic
        # render: its clamped central difference (h[1]-h[0])/1 equals the
        # local (h[1]-h[-1])/2 exactly when h[-1] = 2*h[0]-h[1]. Margin
        # cells are outside clip_box, so the values are never marched.
        if y0 - 1 < 0:
            heights[0, :] = 2.0 * heights[1, :] - heights[2, :]
        if x0 - 1 < 0:
            heights[:, 0] = 2.0 * heights[:, 1] - heights[:, 2]
        if y0 - 1 + n_sub > side:
            heights[-1, :] = 2.0 * heights[-2, :] - heights[-3, :]
        if x0 - 1 + n_sub > side:
            heights[:, -1] = 2.0 * heights[:, -2] - heights[:, -3]
        alb = None
        if with_albedo:
            ys = np.clip(np.arange(y0 - 1, y0 - 1 + n_sub), 0, side - 1)
            xs = np.clip(np.arange(x0 - 1, x0 - 1 + n_sub), 0, side - 1)
            alb = np.asarray(albedo[np.ix_(ys, xs)], np.float32)
        return heights, alb

    best_t = jnp.full((H, W), jnp.inf, jnp.float32)
    best_color = None
    best_normal = jnp.zeros((H, W, 3), jnp.float32)
    any_hit = jnp.zeros((H, W), bool)
    sky_col = None

    for y0, x0 in _tile_origins(side, tile):
        heights, alb = load_tile(y0, x0, albedo is not None)
        scene = make_scene(heights, albedo=alb, light=light)
        # translate the camera into tile-local world coordinates (the
        # margin shifts the tile origin by one more sample)
        off = jnp.asarray([x0 - 1, y0 - 1, 0.0], jnp.float32)
        cam_local = Camera(eye=camera.eye - off, target=camera.target - off,
                           up=camera.up, fov_y=camera.fov_y)
        fr = render_frame(scene, cam_local, sub_cfg)
        hit = fr.hit
        t = jnp.where(hit, fr.depth, jnp.inf)
        closer = t < best_t
        if best_color is None:
            # miss pixels are sky-colored identically in every tile
            sky_col = fr.color
            best_color = fr.color
            best_t = t
            best_normal = fr.normal
            any_hit = hit
        else:
            best_color = jnp.where(closer[..., None], fr.color, best_color)
            best_normal = jnp.where(closer[..., None], fr.normal,
                                    best_normal)
            best_t = jnp.minimum(best_t, t)
            any_hit = any_hit | hit
        # free the sub-scene before the next tile streams in
        del scene

    if best_color is None:
        raise ValueError("heightmap smaller than one cell")

    if config.shadows:
        return _shade_shadowed(camera, config, light, albedo, load_tile,
                               _tile_origins(side, tile), side, t_cells,
                               best_t, best_normal, any_hit)

    color = jnp.where(any_hit[..., None], best_color, sky_col)
    return Frame(color=color,
                 depth=best_t if config.aux_buffers else None,
                 normal=(jnp.where(any_hit[..., None], best_normal, 0.0)
                         if config.aux_buffers else None),
                 hit=any_hit)


def _shade_shadowed(camera, config, light, albedo, load_tile, origins,
                    side, t_cells, best_t, best_normal, any_hit):
    """Stages 2+3 of the shadowed out-of-core frame (module docstring):
    union the per-tile clipped any-hit shadow marches, then shade the
    composited geometry globally — the same expressions as
    core.renderer.shade_hits, so the result matches a monolithic shadowed
    render (tests/test_tiled.py)."""
    from hmrt_tpu.core.renderer import SHADOW_EPS
    from hmrt_tpu.shading import shade as sh
    from hmrt_tpu.traversal.march import march_maxmip

    H, W = config.height, config.width
    lgt = light if light is not None else Light.create()
    eye, dirs = camera.rays(H, W)
    d = dirs.reshape(-1, 3)
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    P = dx.shape[0]
    hit = any_hit.reshape(-1)
    tb = best_t.reshape(-1)
    ts = jnp.where(hit, tb, 0.0)
    px = eye[0] + ts * dx
    py = eye[1] + ts * dy
    pz = eye[2] + ts * dz
    nrm = best_normal.reshape(-1, 3)
    nx, ny, nz = nrm[:, 0], nrm[:, 1], nrm[:, 2]
    lx, ly, lz = lgt.sun_dir[0], lgt.sun_dir[1], lgt.sun_dir[2]

    # stage 2: occlusion — shadow origins offset exactly as shade_hits
    sx = px + lx * SHADOW_EPS + nx * SHADOW_EPS
    sy = py + ly * SHADOW_EPS + ny * SHADOW_EPS
    sz = pz + lz * SHADOW_EPS + nz * SHADOW_EPS
    occ = jnp.zeros(P, bool)
    for y0, x0 in origins:
        heights, _ = load_tile(y0, x0, False)
        sub = make_scene(heights, light=lgt, pack=False)
        shadow_cap = config.max_steps or (8 * sub.n_cells + 256)
        res = march_maxmip(
            jnp.where(hit, sx - (x0 - 1), -1e6),
            jnp.where(hit, sy - (y0 - 1), -1e6), sz,
            jnp.broadcast_to(lx, (P,)), jnp.broadcast_to(ly, (P,)),
            jnp.broadcast_to(lz, (P,)),
            sub.pyr_flat, sub.heights.reshape(-1),
            n=sub.n, m=sub.m, levels=sub.levels, max_steps=shadow_cap,
            cell_intersect=config.cell_intersect, any_hit=True,
            clip=(1.0, 1.0 + t_cells))
        occ = occ | res.hit
        del sub

    # stage 3: global shading from composited geometry (mirrors shade_hits)
    diff = sh.lambert(nx, ny, nz, lx, ly, lz)
    diff = jnp.where(occ, 0.0, diff)
    if config.texture and albedo is not None:
        alb_planar = jnp.asarray(
            np.asarray(albedo, np.float32).reshape(side * side, 3).T.copy())
        ar, ag, ab = sh.sample_albedo(alb_planar, side, px, py)
    else:
        ar = ag = ab = jnp.full_like(px, 0.55)
    amb = config.ambient
    sr, sg, sb = lgt.sun_color[0], lgt.sun_color[1], lgt.sun_color[2]
    r = ar * (amb + diff * sr)
    g = ag * (amb + diff * sg)
    b = ab * (amb + diff * sb)
    if config.shading == "phong":
        spec = sh.phong_specular(nx, ny, nz, lx, ly, lz,
                                 -dx, -dy, -dz, config.shininess)
        spec = jnp.where(occ, 0.0, spec)
        ks = config.specular
        r = r + ks * spec * sr
        g = g + ks * spec * sg
        b = b + ks * spec * sb
    if config.fog:
        r, g, b = sh.apply_fog(r, g, b, ts, config.fog_density,
                               lgt.fog_color)
    skyr, skyg, skyb = sh.sky_color(dz, lgt.sky_top, lgt.sky_horizon)
    r = jnp.where(hit, r, skyr)
    g = jnp.where(hit, g, skyg)
    b = jnp.where(hit, b, skyb)
    color = jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 1.0)
    return Frame(color=color.reshape(H, W, 3),
                 depth=best_t if config.aux_buffers else None,
                 normal=(jnp.where(any_hit[..., None], best_normal, 0.0)
                         if config.aux_buffers else None),
                 hit=any_hit)
