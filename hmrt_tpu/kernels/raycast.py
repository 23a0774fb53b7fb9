"""Fused Pallas raycast kernel: raygen + max-mip march + shade per screen tile.

This is the TPU-native replacement for the reference's per-pixel CUDA kernel
(BASELINE.json:5 "camera ray generation, 2D DDA grid traversal ... and
maximum-mipmap hierarchical stepping become fused Pallas kernels over screen
tiles"). One grid step = one 8x128-pixel screen tile = one VPU-register set
of rays marching in lockstep as a masked wavefront.

How a CUDA texture fetch becomes TPU-legal (see kernels/packing.py):

  COARSE levels (side <= 32, one VMEM buffer): rays start at the pyramid
  top and skip across empty sky with in-register lane-shuffle gathers —
  zero HBM traffic until a ray closes in on the terrain.

  FINE levels (bricked in HBM): the tile runs a DEMAND LOOP — the minimum
  global brick id over live lanes is a scalar, one async DMA pulls that
  4 KB brick into a vector register, and every lane needing it marches
  inside it with lane shuffles until it hits, descends, or leaves the
  brick. Spatially coherent tiles demand few bricks; divergent lanes
  simply wait their turn (the masked-wavefront restructuring of CUDA's
  per-thread control flow that BASELINE.json:5 prescribes).

The march math (step_geometry / descend_cell / intersectors) is imported
from hmrt_tpu.traversal — the SAME jnp functions the oracle renderer runs,
so hit decisions match the fidelity oracle bit-for-bit.
"""

from __future__ import annotations

import functools
import os

# perf-policy experiment knobs (tuned on hardware; see TODO.md)
_ASC_CAP = int(os.environ.get("HMRT_ASC_CAP", "3"))
# columns served per demand-loop iteration: more columns raise the active
# lane count in column-diverged tiles for ~linear extra gather cost.
# Tile footprints span more columns on larger maps, so the sweet spot
# scales with map size (1024^2 HD: 1/2/4/8 -> 807/561/510/748 ms;
# 4096^2 HD: 4/8 -> 5773/5499 ms). 0 = auto by map size.
_N_COL = int(os.environ.get("HMRT_N_COL", "0"))


def _n_col_for(m5: int) -> int:
    if _N_COL:
        return _N_COL
    return 8 if m5 >= 128 else 4
# ascending after a failed level-0 test makes terrain-hugging rays
# ping-pong descend/ascend around the surface: measured 1.75x slower
_ASCEND_ON_TEST_MISS = os.environ.get("HMRT_ASC_MISS", "0") == "1"

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hmrt_tpu.config import RenderConfig
from hmrt_tpu.core.renderer import SHADOW_EPS
from hmrt_tpu.kernels.march_body import (BIG_KEY, _multi_gather, _vreg_gather,
                                         cascade_index, column_of,
                                         fine_gathers, wavefront_step)
from hmrt_tpu.kernels.packing import (COL_ROWS, CORNER_ROW, PackedScene,
                                      cascade_offsets)
from hmrt_tpu.shading import shade as sh
from hmrt_tpu.traversal.intersect import BIG_T, INTERSECTORS
from hmrt_tpu.traversal.march import (entry_cell, ray_box_range,
                                      ray_inverses)
from hmrt_tpu.types import Camera, Frame, Scene

TILE_W = 128      # lane width is fixed by the VPU register shape

# params vector layout (f32[1, 32])
_P_EYE = 0        # 0-2
_P_RIGHT = 3      # 3-5
_P_UP = 6         # 6-8
_P_FWD = 9        # 9-11
_P_TANHALF = 12
_P_ASPECT = 13
_P_SUN = 14       # 14-16
_P_SUNCOL = 17    # 17-19
_P_SKYTOP = 20    # 20-22
_P_SKYHOR = 23    # 23-25
_P_FOGCOL = 26    # 26-28
_P_GMAX = 29
_P_ROW0 = 30   # first screen row of this shard (multi-chip band rendering)
N_PARAMS = 32


def _render_kernel(params_ref, coarse_ref, columns_hbm,
                   shade_hbm, albedo_hbm,
                   *out_refs,
                   col_scr, shade_scr, albedo_scr, sems,
                   config: RenderConfig, n: int, m: int, levels: int,
                   m5: int, l32: int, W: int, H: int, full_h: int,
                   coarse_cap: int, brick_cap: int, inner_cap: int,
                   n_col: int):
    intersector = INTERSECTORS[config.cell_intersect]
    world_max = float(n - 1)
    nb0sq = m5 * m5
    TILE_H = max(config.tile_h, 8)
    shp = (TILE_H, TILE_W)

    def P(i):
        return params_ref[0, i]

    # ---------------- ray generation (SURVEY.md C9) ----------------
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    ii = (jax.lax.broadcasted_iota(jnp.int32, shp, 0) + ti * TILE_H)
    jj = (jax.lax.broadcasted_iota(jnp.int32, shp, 1) + tj * TILE_W)
    in_screen = (ii < H) & (jj < W)
    # row0 shifts this shard's rows into the full screen's NDC space
    # (multi-chip band rendering, distrib/mesh.py); 0 for single-chip
    ndc_x = (jj.astype(jnp.float32) + 0.5) / W * 2.0 - 1.0
    ndc_y = 1.0 - (ii.astype(jnp.float32) + P(_P_ROW0) + 0.5) / full_h * 2.0
    sx = ndc_x * P(_P_TANHALF) * P(_P_ASPECT)
    sy = ndc_y * P(_P_TANHALF)
    dx = P(_P_FWD + 0) + sx * P(_P_RIGHT + 0) + sy * P(_P_UP + 0)
    dy = P(_P_FWD + 1) + sx * P(_P_RIGHT + 1) + sy * P(_P_UP + 1)
    dz = P(_P_FWD + 2) + sx * P(_P_RIGHT + 2) + sy * P(_P_UP + 2)
    # divide (not rsqrt-multiply) to match Camera.rays' normalization bits
    nrm = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    dx, dy, dz = dx / nrm, dy / nrm, dz / nrm
    ox = jnp.full(shp, P(_P_EYE + 0))
    oy = jnp.full(shp, P(_P_EYE + 1))
    oz = jnp.full(shp, P(_P_EYE + 2))

    cbuf = coarse_ref[:]          # (16,128) coarse pyramid, lives in regs
    gmax = P(_P_GMAX)

    # coarse-buffer flat index for (lvl, cy, cx), lvl >= l32
    def coarse_index(lvl, cy, cx):
        q = lvl - l32
        side = 32 >> q
        coff = ((1024 - (1024 >> (2 * q))) * 4) // 3
        return coff + cy * side + cx

    def global_brick_id(lvl, cy, cx):
        mm = m5 * m5
        boff = ((mm - (mm >> (2 * lvl))) * 4) // 3
        nb = m5 >> lvl
        return boff + (cy >> 5) * nb + (cx >> 5)

    def march(ox, oy, oz, dx, dy, dz, valid0, start_cell=None):
        """Full coarse+brick max-mip march for one tile of rays.

        Returns (hit, t_hit, hx, hy). Identical traversal math to
        traversal.march.march_maxmip (shared helpers), restructured into
        the coarse phase (VMEM) + brick demand loop (HBM DMA).

        `start_cell=(cx, cy)`: begin at level 0 in that fine cell instead
        of descending from the pyramid top — used for shadow rays, whose
        origins sit in the primary hit cell (starting at any level is
        correct; this keeps them column-coherent with the primary march
        and skips the full coarse descent).
        """
        t0, t1, valid = ray_box_range(ox, oy, dx, dy, world_max,
                                      config.clip_box)
        inv_x, inv_y = ray_inverses(dx, dy)
        valid = valid & valid0
        # early-out sky test (SURVEY.md C13)
        sky = ((oz + t0 * dz) > gmax) & (dz >= 0.0)
        valid = valid & ~sky

        top = levels - 1
        if start_cell is None:
            lvl = jnp.full(shp, top, jnp.int32)
            icx, icy = entry_cell(ox, oy, dx, dy, t0, lvl, 1)
        else:
            lvl = jnp.zeros(shp, jnp.int32)
            icx = jnp.clip(start_cell[0], 0, m - 1)
            icy = jnp.clip(start_cell[1], 0, m - 1)
        # masks are carried as int32: Mosaic cannot yield i1 vectors
        # through scf.while
        st = dict(
            t=jnp.where(valid, t0, BIG_T),
            lvl=lvl, icx=icx, icy=icy, alive=valid.astype(jnp.int32),
            hit=jnp.zeros(shp, jnp.int32),
            t_hit=jnp.full(shp, BIG_T, jnp.float32),
            hx=jnp.zeros(shp, jnp.int32), hy=jnp.zeros(shp, jnp.int32),
            nin=jnp.zeros(shp, jnp.int32),   # inner steps (diagnostics)
        )

        # -------- phase A: coarse march (levels >= l32, zero HBM) --------
        def a_cond(c):
            i, st = c
            return (i < coarse_cap) & jnp.any((st["alive"] != 0)
                                              & (st["lvl"] >= l32))

        def a_body(c):
            i, st = c
            act = (st["alive"] != 0) & (st["lvl"] >= l32)
            lvl, icx, icy = st["lvl"], st["icx"], st["icy"]
            side = m >> lvl
            cidx = coarse_index(lvl, jnp.clip(icy, 0, side - 1),
                                jnp.clip(icx, 0, side - 1))
            cmax = _vreg_gather(cbuf, cidx, 11)
            st = wavefront_step(st, act, ox, oy, oz, dx, dy, dz,
                                inv_x, inv_y, t1, gmax, cmax,
                                m=m, asc_cap=3, lvl_ceiling=top)
            return i + 1, st

        na, st = jax.lax.while_loop(a_cond, a_body, (jnp.int32(0), st))

        # -------- phase B: column-cascade demand loop (levels < l32) --------
        # Lanes are scheduled by the 32-cell terrain COLUMN their current
        # cell falls in; one scalar selection DMAs that column's whole level
        # cascade (one brick per bricked level + the fine-cell corners), so
        # a lane descends/ascends/marches across all fine levels without
        # further HBM traffic until it leaves the column sideways.
        def col_of(st):
            return column_of(st, m5)

        def b_cond(c):
            i, st = c
            return (i < brick_cap) & jnp.any(st["alive"] != 0)

        def b_body(c):
            i, st = c
            keys = col_of(st)
            sels = []
            rest = keys
            for c in range(n_col):
                sc = jnp.min(rest)
                sels.append(sc)
                rest = jnp.where(rest == sc, BIG_KEY, rest)
            for c, sc in enumerate(sels):
                scc = jnp.minimum(sc, m5 * m5 - 1)
                pltpu.make_async_copy(columns_hbm.at[scc], col_scr.at[c],
                                      sems.at[c]).start()
            for c in range(n_col):
                pltpu.make_async_copy(columns_hbm.at[0], col_scr.at[c],
                                      sems.at[c]).wait()
            sel = sels[0]
            offs = cascade_offsets(l32)
            # per-column records live in col_scr[c]; gathers select by lane

            def in_set(st):
                cols = col_of(st)
                ok = cols == sel
                for sc in sels[1:]:
                    ok = ok | (cols == sc)
                return ok

            def i_cond(cc):
                k, st = cc
                return (k < inner_cap) & jnp.any((st["alive"] != 0)
                                                 & in_set(st))

            def i_body(cc):
                k, st = cc
                act = (st["alive"] != 0) & in_set(st)
                st = dict(st, nin=st["nin"] + 1)
                lvl, icx, icy = st["lvl"], st["icx"], st["icy"]
                at0 = lvl == 0
                fidx = cascade_index(lvl, icx, icy, l32, offs)
                f0 = (icy & 31) * 32 + (icx & 31)
                cols_now = col_of(st)
                cmax, corners_fn = fine_gathers(col_scr, sels, cols_now,
                                                act, at0, lvl, fidx, f0,
                                                l32, CORNER_ROW)
                st = wavefront_step(
                    st, act, ox, oy, oz, dx, dy, dz, inv_x, inv_y, t1,
                    gmax, cmax, corners_fn, m=m, asc_cap=_ASC_CAP,
                    lvl_ceiling=l32 - 1, intersector=intersector,
                    ascend_on_test_miss=_ASCEND_ON_TEST_MISS)
                return k + 1, st

            nk, st = jax.lax.while_loop(i_cond, i_body, (jnp.int32(0), st))
            return i + 1, st

        nb, st = jax.lax.while_loop(b_cond, b_body, (jnp.int32(0), st))
        return (st["hit"] != 0, st["t_hit"], st["hx"], st["hy"],
                (na, nb, st["nin"]))

    # ================= primary rays =================
    hit, t_hit, hx, hy, counters = march(ox, oy, oz, dx, dy, dz, in_screen)

    ts = jnp.where(hit, t_hit, 0.0)
    px = ox + ts * dx
    py = oy + ts * dy
    pz = oz + ts * dz

    # ---------- shading-data demand loop: corner gradients ----------
    bid0 = jnp.where(hit, (hy >> 5) * m5 + (hx >> 5), BIG_KEY)
    nx_s = jnp.zeros(shp, jnp.float32)
    ny_s = jnp.zeros(shp, jnp.float32)
    nz_s = jnp.ones(shp, jnp.float32)
    ar = jnp.full(shp, 0.55)
    ag = jnp.full(shp, 0.55)
    ab = jnp.full(shp, 0.55)

    fshade = (hy & 31) * 32 + (hx & 31)
    fx = jnp.clip(px - hx.astype(jnp.float32), 0.0, 1.0)
    fy = jnp.clip(py - hy.astype(jnp.float32), 0.0, 1.0)

    def bilerp(v00, v10, v01, v11):
        return (v00 * (1 - fx) * (1 - fy) + v10 * fx * (1 - fy)
                + v01 * (1 - fx) * fy + v11 * fx * fy)

    def s_cond(c):
        i, pend, nx_s, ny_s, nz_s, ar, ag, ab = c
        return (i < brick_cap) & jnp.any(pend < BIG_KEY)

    def s_body(c):
        i, pend, nx_s, ny_s, nz_s, ar, ag, ab = c
        sel = jnp.min(pend)
        cs = pltpu.make_async_copy(shade_hbm.at[sel], shade_scr, sems.at[0])
        cs.start()
        if config.texture:
            ca = pltpu.make_async_copy(albedo_hbm.at[sel], albedo_scr,
                                       sems.at[1])
            ca.start()
            ca.wait()
        cs.wait()
        mine = pend == sel
        gs = _multi_gather(tuple(shade_scr[c] for c in range(8)), fshade)
        gx = bilerp(gs[0], gs[1], gs[2], gs[3])
        gy = bilerp(gs[4], gs[5], gs[6], gs[7])
        inv = jax.lax.rsqrt(gx * gx + gy * gy + 1.0)
        nx_s = jnp.where(mine, -gx * inv, nx_s)
        ny_s = jnp.where(mine, -gy * inv, ny_s)
        nz_s = jnp.where(mine, inv, nz_s)
        if config.texture:
            ga = _multi_gather(tuple(albedo_scr[c] for c in range(12)), fshade)
            ar = jnp.where(mine, bilerp(ga[0], ga[1], ga[2], ga[3]), ar)
            ag = jnp.where(mine, bilerp(ga[4], ga[5], ga[6], ga[7]), ag)
            ab = jnp.where(mine, bilerp(ga[8], ga[9], ga[10], ga[11]), ab)
        pend = jnp.where(mine, BIG_KEY, pend)
        return i + 1, pend, nx_s, ny_s, nz_s, ar, ag, ab

    (_, _, nx_s, ny_s, nz_s, ar, ag, ab) = jax.lax.while_loop(
        s_cond, s_body,
        (jnp.int32(0), bid0, nx_s, ny_s, nz_s, ar, ag, ab))

    lx, ly, lz = P(_P_SUN + 0), P(_P_SUN + 1), P(_P_SUN + 2)
    diff = sh.lambert(nx_s, ny_s, nz_s, lx, ly, lz)

    # ================= shadow rays (SURVEY.md C17) =================
    if config.shadows:
        sxo = px + lx * SHADOW_EPS + nx_s * SHADOW_EPS
        syo = py + ly * SHADOW_EPS + ny_s * SHADOW_EPS
        szo = pz + lz * SHADOW_EPS + nz_s * SHADOW_EPS
        l_x = jnp.full(shp, lx)
        l_y = jnp.full(shp, ly)
        l_z = jnp.full(shp, lz)
        occ, _, _, _, _ = march(jnp.where(hit, sxo, -1e6),
                                jnp.where(hit, syo, -1e6), szo,
                                l_x, l_y, l_z, hit, start_cell=(hx, hy))
        diff = jnp.where(occ, 0.0, diff)

    # ================= final shading =================
    sr, sg, sb = P(_P_SUNCOL + 0), P(_P_SUNCOL + 1), P(_P_SUNCOL + 2)
    r = ar * (config.ambient + diff * sr)
    g = ag * (config.ambient + diff * sg)
    b = ab * (config.ambient + diff * sb)

    if config.shading == "phong":
        spec = sh.phong_specular(nx_s, ny_s, nz_s, lx, ly, lz,
                                 -dx, -dy, -dz, config.shininess)
        if config.shadows:
            spec = jnp.where(occ, 0.0, spec)
        r = r + config.specular * spec * sr
        g = g + config.specular * spec * sg
        b = b + config.specular * spec * sb

    if config.fog:
        fr_, fg_, fb_ = P(_P_FOGCOL), P(_P_FOGCOL + 1), P(_P_FOGCOL + 2)
        r, g, b = sh.apply_fog(r, g, b, ts, config.fog_density,
                               (fr_, fg_, fb_))

    skyr, skyg, skyb = sh.sky_color(
        dz, (P(_P_SKYTOP), P(_P_SKYTOP + 1), P(_P_SKYTOP + 2)),
        (P(_P_SKYHOR), P(_P_SKYHOR + 1), P(_P_SKYHOR + 2)))
    r = jnp.clip(jnp.where(hit, r, skyr), 0.0, 1.0)
    g = jnp.clip(jnp.where(hit, g, skyg), 0.0, 1.0)
    b = jnp.clip(jnp.where(hit, b, skyb), 0.0, 1.0)

    out_refs[0][:] = r
    out_refs[1][:] = g
    out_refs[2][:] = b
    out_refs[3][:] = jnp.where(hit, t_hit, jnp.inf)
    out_refs[4][:] = hit.astype(jnp.int32)
    k = 5
    if config.aux_buffers:
        out_refs[k][:] = jnp.where(hit, nx_s, 0.0)
        out_refs[k + 1][:] = jnp.where(hit, ny_s, 0.0)
        out_refs[k + 2][:] = jnp.where(hit, nz_s, 0.0)
        k += 3
    if config.debug_counters:
        na, nb, nin = counters
        out_refs[k][:] = jnp.full(shp, na)       # coarse wavefront steps
        out_refs[k + 1][:] = jnp.full(shp, nb)   # column switches
        out_refs[k + 2][:] = nin                 # inner steps


def _cdiv(a, b):
    return -(-a // b)


@functools.partial(jax.jit, static_argnames=("config", "n", "m", "levels",
                                             "m5", "l32", "interpret",
                                             "full_height"))
def _render_pallas_jit(params, packed_coarse, packed_columns,
                       packed_shade, packed_albedo, *, config: RenderConfig,
                       n: int, m: int, levels: int, m5: int, l32: int,
                       interpret: bool, full_height: int | None = None):
    H, W = config.height, config.width
    full_h = full_height or H
    TILE_H = max(config.tile_h, 8)
    gh, gw = _cdiv(H, TILE_H), _cdiv(W, TILE_W)
    Hp, Wp = gh * TILE_H, gw * TILE_W

    n_out = 5 + (3 if config.aux_buffers else 0) \
        + (3 if config.debug_counters else 0)
    out_dtypes = ([jnp.float32] * 4 + [jnp.int32]
                  + ([jnp.float32] * 3 if config.aux_buffers else [])
                  + ([jnp.int32] * 3 if config.debug_counters else []))
    out_shape = [jax.ShapeDtypeStruct((Hp, Wp), dt) for dt in out_dtypes]
    out_specs = [pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j))
                 for _ in range(n_out)]

    coarse_cap = 24 * levels + 96
    brick_cap = 16 * m5 + 512     # safety bound; the demand loop exits early
    inner_cap = 256

    n_col = _n_col_for(m5)
    kern = functools.partial(
        _render_kernel, config=config, n=n, m=m, levels=levels, m5=m5,
        l32=l32, W=W, H=H, full_h=full_h, coarse_cap=coarse_cap,
        brick_cap=brick_cap, inner_cap=inner_cap, n_col=n_col)

    def kernel_entry(params_ref, coarse_ref, columns, shade, albedo, *refs):
        out_refs = refs[:n_out]
        col_scr, shade_scr, albedo_scr, sems = refs[n_out:]
        kern(params_ref, coarse_ref, columns, shade, albedo,
             *out_refs, col_scr=col_scr,
             shade_scr=shade_scr, albedo_scr=albedo_scr, sems=sems)

    albedo = packed_albedo
    if albedo is None:
        albedo = jnp.zeros((1, 12, 8, 128), jnp.float32)

    outs = pl.pallas_call(
        kernel_entry,
        grid=(gh, gw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # params
            pl.BlockSpec(memory_space=pltpu.VMEM),    # coarse
            pl.BlockSpec(memory_space=pl.ANY),        # column records (HBM)
            pl.BlockSpec(memory_space=pl.ANY),        # shade (HBM)
            pl.BlockSpec(memory_space=pl.ANY),        # albedo (HBM)
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((n_col, COL_ROWS, TILE_W), jnp.float32),  # col records
            pltpu.VMEM((8, 8, TILE_W), jnp.float32),      # shade bricks
            pltpu.VMEM((12, 8, TILE_W), jnp.float32),     # albedo bricks
            pltpu.SemaphoreType.DMA((max(n_col, 2),)),
        ],
        interpret=interpret,
    )(params, packed_coarse, packed_columns, packed_shade, albedo)

    crop = lambda a: a[:H, :W]
    r, g, b, depth, hit = [crop(o) for o in outs[:5]]
    color = jnp.stack([r, g, b], axis=-1)
    normal = None
    if config.aux_buffers:
        normal = jnp.stack([crop(o) for o in outs[5:8]], axis=-1)
    frame = Frame(color=color,
                  depth=depth if config.aux_buffers else None,
                  normal=normal,
                  hit=hit.astype(bool))
    if config.debug_counters:
        return frame, tuple(outs[-3:])
    return frame


def make_params(scene: Scene, camera: Camera) -> jax.Array:
    """Pack camera + light scalars into the kernel's SMEM params vector."""
    right, up, fwd = camera.basis()
    light = scene.light
    gmax = scene.pyr_flat[-1]
    vals = jnp.concatenate([
        camera.eye, right, up, fwd,
        jnp.stack([jnp.tan(camera.fov_y * 0.5),
                   jnp.float32(1.0)]),  # aspect patched below
        light.sun_dir, light.sun_color, light.sky_top, light.sky_horizon,
        light.fog_color, gmax[None],
    ])
    pad = N_PARAMS - vals.shape[0] - 2
    vals = jnp.concatenate([vals, jnp.zeros(pad + 2, jnp.float32)])
    return vals.reshape(1, N_PARAMS)


def render_frame_pallas(scene: Scene, packed: PackedScene, camera: Camera,
                        config: RenderConfig, interpret: bool = False,
                        row0=None, full_height: int | None = None) -> Frame:
    """Render via the fused tile kernel. `row0`/`full_height` place this
    render as a row-band of a larger screen (multi-chip sharding)."""
    params = make_params(scene, camera)
    fh = full_height or config.height
    params = params.at[0, _P_ASPECT].set(config.width / fh)
    if row0 is not None:
        params = params.at[0, _P_ROW0].set(row0)
    return _render_pallas_jit(
        params, packed.coarse, packed.columns, packed.shade,
        packed.albedo, config=config, n=scene.n, m=scene.m,
        levels=scene.levels, m5=packed.m5, l32=packed.l32,
        interpret=interpret, full_height=fh)
