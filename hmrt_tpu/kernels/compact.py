"""Compacted-wavefront renderer: march passes + ray sorting (C26, M5).

BASELINE.json:5 prescribes "masked wavefront-style vectorized marching with
periodic compaction so lanes stay dense on the VPU". The fused kernel
(kernels/raycast.py) keeps rays in screen order for their whole life, so a
tile whose rays straddle many terrain columns serializes its demand loop
(measured ~25-40% lane efficiency on horizon views). This module is the
compaction architecture:

  1. rays are generated and initialized in XLA (identical math to the
     oracle), state lives in flat per-lane planes;
  2. a MARCH PASS is one Pallas kernel sweep over (8,128)-lane blocks of
     ray state: coarse VMEM phase + column demand loop, with a bounded
     per-block iteration budget; unresolved lanes exit with saved state;
  3. after the first (screen-ordered) pass, surviving rays are SORTED by
     their current terrain column (one argsort + row-gather — the state
     rides in a (P,16) f32 row matrix so the permutation is a fast row
     gather), making every subsequent block column-coherent; passes repeat
     under a lax.while_loop until every ray resolves;
  4. hits are sorted by hit column once more for the SHADE PASS (corner
     gradients + albedo fetched per column), shadow rays reuse that same
     ordering, and the final color math is plain fused XLA elementwise.

Exactness: the march body is the same shared traversal math; results are
bit-identical to the fused kernel and the oracle (tests/test_compact.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hmrt_tpu.config import RenderConfig
from hmrt_tpu.core.renderer import SHADOW_EPS
from hmrt_tpu.kernels.packing import COL_ROWS, CORNER_ROW, PackedScene, cascade_offsets
from hmrt_tpu.kernels import raycast as rk
from hmrt_tpu.shading import shade as sh
from hmrt_tpu.traversal.intersect import BIG_T, INTERSECTORS
from hmrt_tpu.traversal.march import (T_TOL, EPS_EXIT, ascent_levels,
                                      descend_cell, entry_cell,
                                      ray_box_range, ray_inverses,
                                      step_geometry)
from hmrt_tpu.types import Camera, Frame, Scene

BIG_KEY = rk.BIG_KEY
LANES = 1024          # rays per kernel block: one (8,128) register set


# ---------------------------------------------------------------------------
# march-pass kernel over explicit ray state
# ---------------------------------------------------------------------------

def _march_pass_kernel(coarse_ref, columns_hbm,
                       ox_r, oy_r, oz_r, dx_r, dy_r, dz_r,
                       t_r, lvl_r, icx_r, icy_r, alive_r,
                       alive_o, t_o, lvl_o, icx_o, icy_o,
                       hit_o, thit_o, hx_o, hy_o,
                       col_scr, sems, *,
                       n: int, m: int, levels: int, m5: int, l32: int,
                       cell_intersect: str,
                       coarse_cap: int, budget: int, inner_cap: int):
    intersector = INTERSECTORS[cell_intersect]
    world_max = float(n - 1)
    shp = (8, 128)
    top = levels - 1

    ox, oy, oz = ox_r[:], oy_r[:], oz_r[:]
    dx, dy, dz = dx_r[:], dy_r[:], dz_r[:]
    inv_x, inv_y = ray_inverses(dx, dy)
    _, t1, _ = ray_box_range(ox, oy, dx, dy, world_max)

    cbuf = coarse_ref[:]
    # global max = the pyramid top, which is the last valid coarse entry
    # (the coarse buffer always packs sides 32..1 = 1365 values)
    gmax = cbuf[1364 >> 7, 1364 & 127]

    def coarse_index(lvl, cy, cx):
        q = lvl - l32
        side = 32 >> q
        coff = ((1024 - (1024 >> (2 * q))) * 4) // 3
        return coff + cy * side + cx

    st = dict(
        t=t_r[:], lvl=lvl_r[:], icx=icx_r[:], icy=icy_r[:],
        alive=alive_r[:],
        hit=jnp.zeros(shp, jnp.int32),
        t_hit=jnp.full(shp, BIG_T, jnp.float32),
        hx=jnp.zeros(shp, jnp.int32), hy=jnp.zeros(shp, jnp.int32),
    )

    # -------- phase A: coarse levels (VMEM), uncapped by the budget --------
    def a_cond(c):
        i, st = c
        return (i < coarse_cap) & jnp.any((st["alive"] != 0)
                                          & (st["lvl"] >= l32))

    def a_body(c):
        i, st = c
        act = (st["alive"] != 0) & (st["lvl"] >= l32)
        t, lvl, icx, icy = st["t"], st["lvl"], st["icx"], st["icy"]
        t_exit, nx, ny, bnd = step_geometry(ox, oy, dx, dy, icx, icy, lvl,
                                            inv_x, inv_y)
        t_exit_c = jnp.minimum(t_exit, t1)
        zmin = oz + jnp.minimum(t * dz, t_exit_c * dz)
        side = m >> lvl
        cidx = coarse_index(lvl, jnp.clip(icy, 0, side - 1),
                            jnp.clip(icx, 0, side - 1))
        cmax = rk._vreg_gather(cbuf, cidx, 11)
        skip = zmin > cmax
        descend = act & ~skip
        advance = act & skip
        dcx, dcy = descend_cell(ox, oy, dx, dy, t, icx, icy, lvl)
        asc = jnp.where(advance, jnp.minimum(ascent_levels(bnd), 3), 0)
        asc = jnp.minimum(asc, top - lvl)
        new_lvl = jnp.where(descend, lvl - 1, lvl + asc)
        adv_x = nx >> asc
        adv_y = ny >> asc
        new_icx = jnp.where(descend, dcx, jnp.where(advance, adv_x, icx))
        new_icy = jnp.where(descend, dcy, jnp.where(advance, adv_y, icy))
        new_t = jnp.where(advance, jnp.maximum(t, t_exit_c), t)
        new_side = m >> new_lvl
        escaped = advance & (oz + new_t * dz > gmax) & (dz > 0.0)
        out = (advance & ((t_exit >= t1 - EPS_EXIT)
                          | (new_icx < 0) | (new_icx >= new_side)
                          | (new_icy < 0) | (new_icy >= new_side))
               | escaped)
        st = dict(st)
        st["t"] = jnp.where(act, new_t, t)
        st["lvl"] = jnp.where(act, new_lvl, lvl)
        st["icx"] = jnp.where(act, new_icx, icx)
        st["icy"] = jnp.where(act, new_icy, icy)
        st["alive"] = st["alive"] * (1 - out.astype(jnp.int32))
        return i + 1, st

    _, st = jax.lax.while_loop(a_cond, a_body, (jnp.int32(0), st))

    # -------- phase B: column demand loop with iteration budget --------
    def col_of(st):
        colx = jnp.clip((st["icx"] << st["lvl"]) >> 5, 0, m5 - 1)
        coly = jnp.clip((st["icy"] << st["lvl"]) >> 5, 0, m5 - 1)
        return jnp.where(st["alive"] != 0, coly * m5 + colx, BIG_KEY)

    offs = cascade_offsets(l32)

    def b_cond(c):
        nin, st = c
        return (nin < budget) & jnp.any(st["alive"] != 0)

    def b_body(c):
        nin, st = c
        sel = jnp.min(col_of(st))
        cp = pltpu.make_async_copy(columns_hbm.at[sel], col_scr, sems.at[0])
        cp.start()
        cp.wait()
        casc = col_scr[0:CORNER_ROW, :]
        c00 = col_scr[CORNER_ROW + 0:CORNER_ROW + 8, :]
        c10 = col_scr[CORNER_ROW + 8:CORNER_ROW + 16, :]
        c01 = col_scr[CORNER_ROW + 16:CORNER_ROW + 24, :]
        c11 = col_scr[CORNER_ROW + 24:CORNER_ROW + 32, :]

        def i_cond(cc):
            k, st = cc
            return (k < inner_cap) & jnp.any((st["alive"] != 0)
                                             & (col_of(st) == sel))

        def i_body(cc):
            k, st = cc
            act = (st["alive"] != 0) & (col_of(st) == sel)
            t, lvl, icx, icy = st["t"], st["lvl"], st["icx"], st["icy"]
            t_exit, nx, ny, bnd = step_geometry(ox, oy, dx, dy, icx, icy,
                                                lvl, inv_x, inv_y)
            t_exit_c = jnp.minimum(t_exit, t1)
            zmin = oz + jnp.minimum(t * dz, t_exit_c * dz)
            s_loc = jnp.maximum(32 >> lvl, 1)
            mask_l = s_loc - 1
            off = jnp.zeros(shp, jnp.int32)
            for l in range(l32):
                off = jnp.where(lvl == l, offs[l], off)
            fidx = off + (icy & mask_l) * s_loc + (icx & mask_l)
            cmax = rk._vreg_gather(casc, fidx, 11)
            skip = zmin > cmax
            at0 = lvl == 0
            descend = act & ~skip & ~at0
            test = act & ~skip & at0
            f0 = (icy & 31) * 32 + (icx & 31)
            z00, z10, z01, z11 = rk._multi_gather((c00, c10, c01, c11), f0)
            hit_now, t_c = intersector(ox, oy, oz, dx, dy, dz, icx, icy,
                                       z00, z10, z01, z11,
                                       t - T_TOL, t_exit_c + T_TOL)
            hit_now = hit_now & test
            advance = act & ~descend & ~hit_now
            dcx, dcy = descend_cell(ox, oy, dx, dy, t, icx, icy, lvl)
            # no ascent after a failed exact test (see raycast.py)
            asc = jnp.where(act & skip & advance,
                            jnp.minimum(ascent_levels(bnd), 3), 0)
            asc = jnp.minimum(asc, (l32 - 1) - lvl)
            new_lvl = jnp.where(descend, lvl - 1, lvl + asc)
            adv_x = nx >> asc
            adv_y = ny >> asc
            new_icx = jnp.where(descend, dcx, jnp.where(advance, adv_x, icx))
            new_icy = jnp.where(descend, dcy, jnp.where(advance, adv_y, icy))
            new_t = jnp.where(advance, jnp.maximum(t, t_exit_c), t)
            new_side = m >> new_lvl
            escaped = advance & (oz + new_t * dz > gmax) & (dz > 0.0)
            out = (advance & ((t_exit >= t1 - EPS_EXIT)
                              | (new_icx < 0) | (new_icx >= new_side)
                              | (new_icy < 0) | (new_icy >= new_side))
                   | escaped)
            st = dict(st)
            st["t"] = jnp.where(act, new_t, t)
            st["lvl"] = jnp.where(act, new_lvl, lvl)
            st["icx"] = jnp.where(act, new_icx, icx)
            st["icy"] = jnp.where(act, new_icy, icy)
            st["alive"] = (st["alive"]
                           * (1 - hit_now.astype(jnp.int32))
                           * (1 - out.astype(jnp.int32)))
            st["hit"] = jnp.maximum(st["hit"], hit_now.astype(jnp.int32))
            st["t_hit"] = jnp.where(hit_now, t_c, st["t_hit"])
            st["hx"] = jnp.where(hit_now, icx, st["hx"])
            st["hy"] = jnp.where(hit_now, icy, st["hy"])
            return k + 1, st

        k, st = jax.lax.while_loop(i_cond, i_body, (jnp.int32(0), st))
        return nin + k, st

    _, st = jax.lax.while_loop(b_cond, b_body, (jnp.int32(0), st))

    alive_o[:] = st["alive"]
    t_o[:] = st["t"]
    lvl_o[:] = st["lvl"]
    icx_o[:] = st["icx"]
    icy_o[:] = st["icy"]
    hit_o[:] = st["hit"]
    thit_o[:] = st["t_hit"]
    hx_o[:] = st["hx"]
    hy_o[:] = st["hy"]


def _plane_specs(k):
    return [pl.BlockSpec((8, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM) for _ in range(k)]


@functools.partial(jax.jit,
                   static_argnames=("n", "m", "levels", "m5", "l32",
                                    "cell_intersect", "budget", "interpret"))
def march_pass(coarse, columns, rays, state, *, n, m, levels, m5, l32,
               cell_intersect, budget, interpret=False):
    """One budgeted march sweep over all ray blocks.

    rays:  (ox, oy, oz, dx, dy, dz) planes, each f32[P] with P % 1024 == 0
    state: (alive_i32, t, lvl, icx, icy) planes
    Returns (new_state, results) where results = (hit_i32, t_hit, hx, hy).
    """
    P = rays[0].shape[0]
    R = P // 128
    planes = [r.reshape(R, 128) for r in rays] \
        + [state[1].reshape(R, 128), state[2].reshape(R, 128),
           state[3].reshape(R, 128), state[4].reshape(R, 128),
           state[0].reshape(R, 128)]
    grid = (R // 8,)

    kern = functools.partial(
        _march_pass_kernel, n=n, m=m, levels=levels, m5=m5, l32=l32,
        cell_intersect=cell_intersect,
        coarse_cap=24 * levels + 96, budget=budget, inner_cap=256)

    out_dt = ([jnp.int32, jnp.float32, jnp.int32, jnp.int32, jnp.int32]
              + [jnp.int32, jnp.float32, jnp.int32, jnp.int32])
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=([pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pl.ANY)]
                  + _plane_specs(11)),
        out_specs=_plane_specs(9),
        out_shape=[jax.ShapeDtypeStruct((R, 128), dt) for dt in out_dt],
        scratch_shapes=[
            pltpu.VMEM((COL_ROWS, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(coarse, columns, *planes)
    flat = [o.reshape(P) for o in outs]
    new_state = (flat[0], flat[1], flat[2], flat[3], flat[4])
    results = (flat[5], flat[6], flat[7], flat[8])
    return new_state, results


# ---------------------------------------------------------------------------
# shade-data kernel: per-hit column fetch of gradients + albedo
# ---------------------------------------------------------------------------

def _shade_pass_kernel(shade_hbm, albedo_hbm,
                       hit_r, hx_r, hy_r, fx_r, fy_r,
                       nx_o, ny_o, nz_o, ar_o, ag_o, ab_o,
                       shade_scr, albedo_scr, sems, *,
                       m5: int, textured: bool, brick_cap: int):
    shp = (8, 128)
    hit = hit_r[:] != 0
    hx, hy = hx_r[:], hy_r[:]
    fx, fy = fx_r[:], fy_r[:]
    f0 = (hy & 31) * 32 + (hx & 31)
    bid = jnp.where(hit, (hy >> 5) * m5 + (hx >> 5), BIG_KEY)

    def bilerp(v00, v10, v01, v11):
        return (v00 * (1 - fx) * (1 - fy) + v10 * fx * (1 - fy)
                + v01 * (1 - fx) * fy + v11 * fx * fy)

    def cond(c):
        i, pend, *_ = c
        return (i < brick_cap) & jnp.any(pend < BIG_KEY)

    def body(c):
        i, pend, nx, ny, nz, ar, ag, ab = c
        sel = jnp.min(pend)
        cs = pltpu.make_async_copy(shade_hbm.at[sel], shade_scr, sems.at[0])
        cs.start()
        if textured:
            ca = pltpu.make_async_copy(albedo_hbm.at[sel], albedo_scr,
                                       sems.at[1])
            ca.start()
            ca.wait()
        cs.wait()
        mine = pend == sel
        gs = rk._multi_gather(tuple(shade_scr[c] for c in range(8)), f0)
        gx = bilerp(gs[0], gs[1], gs[2], gs[3])
        gy = bilerp(gs[4], gs[5], gs[6], gs[7])
        inv = jax.lax.rsqrt(gx * gx + gy * gy + 1.0)
        nx = jnp.where(mine, -gx * inv, nx)
        ny = jnp.where(mine, -gy * inv, ny)
        nz = jnp.where(mine, inv, nz)
        if textured:
            ga = rk._multi_gather(tuple(albedo_scr[c] for c in range(12)), f0)
            ar = jnp.where(mine, bilerp(ga[0], ga[1], ga[2], ga[3]), ar)
            ag = jnp.where(mine, bilerp(ga[4], ga[5], ga[6], ga[7]), ag)
            ab = jnp.where(mine, bilerp(ga[8], ga[9], ga[10], ga[11]), ab)
        pend = jnp.where(mine, BIG_KEY, pend)
        return i + 1, pend, nx, ny, nz, ar, ag, ab

    init = (jnp.int32(0), bid,
            jnp.zeros(shp, jnp.float32), jnp.zeros(shp, jnp.float32),
            jnp.ones(shp, jnp.float32),
            jnp.full(shp, 0.55), jnp.full(shp, 0.55), jnp.full(shp, 0.55))
    _, _, nx, ny, nz, ar, ag, ab = jax.lax.while_loop(cond, body, init)
    nx_o[:] = nx
    ny_o[:] = ny
    nz_o[:] = nz
    ar_o[:] = ar
    ag_o[:] = ag
    ab_o[:] = ab


@functools.partial(jax.jit, static_argnames=("m5", "textured", "interpret"))
def shade_pass(shade, albedo, hit, hx, hy, fx, fy, *, m5, textured,
               interpret=False):
    P = hit.shape[0]
    R = P // 128
    planes = [a.reshape(R, 128) for a in (hit, hx, hy, fx, fy)]
    if albedo is None:
        albedo = jnp.zeros((1, 12, 8, 128), jnp.float32)
    kern = functools.partial(_shade_pass_kernel, m5=m5, textured=textured,
                             brick_cap=2 * m5 * m5 + 64)
    outs = pl.pallas_call(
        kern,
        grid=(R // 8,),
        in_specs=([pl.BlockSpec(memory_space=pl.ANY)] * 2 + _plane_specs(5)),
        out_specs=_plane_specs(6),
        out_shape=[jax.ShapeDtypeStruct((R, 128), jnp.float32)
                   for _ in range(6)],
        scratch_shapes=[
            pltpu.VMEM((8, 8, 128), jnp.float32),
            pltpu.VMEM((12, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(shade, albedo, *planes)
    return [o.reshape(P) for o in outs]


# ---------------------------------------------------------------------------
# XLA orchestration
# ---------------------------------------------------------------------------

def _init_state(ox, oy, oz, dx, dy, dz, valid0, gmax, *, n, levels):
    """Initial march state — identical math to the kernels' entry logic."""
    world_max = float(n - 1)
    t0, t1, valid = ray_box_range(ox, oy, dx, dy, world_max)
    valid = valid & valid0
    sky = ((oz + t0 * dz) > gmax) & (dz >= 0.0)
    valid = valid & ~sky
    top = levels - 1
    lvl = jnp.full(ox.shape, top, jnp.int32)
    icx, icy = entry_cell(ox, oy, dx, dy, t0, lvl, 1)
    return (valid.astype(jnp.int32), jnp.where(valid, t0, BIG_T),
            lvl, icx, icy)


def _column_key(state, m5):
    alive, t, lvl, icx, icy = state
    colx = jnp.clip((icx << lvl) >> 5, 0, m5 - 1)
    coly = jnp.clip((icy << lvl) >> 5, 0, m5 - 1)
    return jnp.where(alive != 0, coly * m5 + colx, BIG_KEY)


def _pack_rows(*planes):
    """Stack f32/i32 planes into a (P, C) f32 row matrix.

    Integer planes are VALUE-converted (all march integers — levels, cell
    coords, masks — are far below 2^24, so the f32 round-trip is exact).
    Bitcast packing miscompiled on real hardware when fused with the sort
    gather into one XLA program: resumed state reached the second march
    pass corrupted. Value conversion sidesteps it and is equally exact.
    """
    return jnp.stack([p.astype(jnp.float32) for p in planes], axis=1)


def _unpack_rows(rows, dtypes):
    return [rows[:, i].astype(dt) for i, dt in enumerate(dtypes)]


@functools.partial(jax.jit,
                   static_argnames=("config", "n", "m", "levels", "m5",
                                    "l32", "interpret", "first_budget"))
def _render_compact_jit(camera, light, coarse, columns, shade_b, albedo_b,
                        gmax, *, config: RenderConfig, n, m, levels, m5, l32,
                        interpret, first_budget=256):
    H, W = config.height, config.width
    P = -(-H * W // LANES) * LANES

    eye, dirs = camera.rays(H, W)
    d = dirs.reshape(-1, 3)
    pad = P - d.shape[0]
    d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    valid0 = jnp.arange(P) < H * W
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    ox = jnp.broadcast_to(eye[0], (P,))
    oy = jnp.broadcast_to(eye[1], (P,))
    oz = jnp.broadcast_to(eye[2], (P,))
    rays = (ox, oy, oz, dx, dy, dz)

    mkw = dict(n=n, m=m, levels=levels, m5=m5, l32=l32,
               cell_intersect=config.cell_intersect, interpret=interpret)

    def full_march(rays, state, first_budget=first_budget):
        # pass 1: screen/launch order, budgeted
        state, res = march_pass(coarse, columns, rays, state,
                                budget=first_budget, **mkw)
        # compaction: sort survivors by current column, then march rounds
        key = _column_key(state, m5)
        perm = jnp.argsort(key)
        inv = jnp.argsort(perm)
        row_dts = ([jnp.float32] * 6
                   + [jnp.int32, jnp.float32, jnp.int32, jnp.int32, jnp.int32])
        rows = _pack_rows(*rays, *state)
        rows_s = jnp.take(rows, perm, axis=0)
        cols = _unpack_rows(rows_s, row_dts)
        rays_s = tuple(cols[:6])
        state_s = tuple(cols[6:])

        # one unbudgeted pass over the sorted (column-coherent) survivors.
        # NOTE: wrapping the pallas_call in a lax.while_loop of rounds
        # miscompiled on real hardware (hits silently lost; exact when the
        # same rounds ran as separate dispatches) — a single generous pass
        # resolves everything anyway since the march makes integer progress.
        state_s, res2s = march_pass(coarse, columns, rays_s, state_s,
                                    budget=1 << 22, **mkw)
        res_rows = _pack_rows(*res2s)
        res2 = _unpack_rows(jnp.take(res_rows, inv, axis=0),
                            [jnp.int32, jnp.float32, jnp.int32, jnp.int32])
        hit = (res[0] != 0) | (res2[0] != 0)
        t_hit = jnp.where(res[0] != 0, res[1], res2[1])
        hx = jnp.where(res[0] != 0, res[2], res2[2])
        hy = jnp.where(res[0] != 0, res[3], res2[3])
        return hit, t_hit, hx, hy

    hit, t_hit, hx, hy = full_march(rays, _init_state(
        ox, oy, oz, dx, dy, dz, valid0, gmax, n=n, levels=levels))

    # ---------------- shading data (sorted by hit column) ----------------
    ts = jnp.where(hit, t_hit, 0.0)
    px = ox + ts * dx
    py = oy + ts * dy
    pz = oz + ts * dz
    fx = jnp.clip(px - hx.astype(jnp.float32), 0.0, 1.0)
    fy = jnp.clip(py - hy.astype(jnp.float32), 0.0, 1.0)
    key_h = jnp.where(hit, (hy >> 5) * m5 + (hx >> 5), BIG_KEY)
    perm_h = jnp.argsort(key_h)
    inv_h = jnp.argsort(perm_h)
    hrows = _pack_rows(hit.astype(jnp.int32), hx, hy, fx, fy)
    hrows_s = jnp.take(hrows, perm_h, axis=0)
    hcols = _unpack_rows(hrows_s, [jnp.int32] * 3 + [jnp.float32] * 2)
    shaded = shade_pass(shade_b, albedo_b, *hcols, m5=m5,
                        textured=bool(config.texture and albedo_b is not None),
                        interpret=interpret)
    srows = jnp.take(_pack_rows(*shaded), inv_h, axis=0)
    nx_s, ny_s, nz_s, ar, ag, ab = [srows[:, i] for i in range(6)]

    lx, ly, lz = light.sun_dir[0], light.sun_dir[1], light.sun_dir[2]
    diff = sh.lambert(nx_s, ny_s, nz_s, lx, ly, lz)

    # ---------------- shadows: reuse the hit-column ordering --------------
    occ = jnp.zeros(P, bool)
    if config.shadows:
        sxo = px + lx * SHADOW_EPS + nx_s * SHADOW_EPS
        syo = py + ly * SHADOW_EPS + ny_s * SHADOW_EPS
        szo = pz + lz * SHADOW_EPS + nz_s * SHADOW_EPS
        srays = (jnp.where(hit, sxo, -1e6), jnp.where(hit, syo, -1e6), szo,
                 jnp.broadcast_to(lx, (P,)), jnp.broadcast_to(ly, (P,)),
                 jnp.broadcast_to(lz, (P,)))
        sstate = _init_state(*srays, hit, gmax, n=n, levels=levels)
        shit, _, _, _ = full_march(srays, sstate, first_budget=256)
        occ = shit
        diff = jnp.where(occ, 0.0, diff)

    # ---------------- final color math (fused XLA elementwise) ------------
    sr, sg, sb = light.sun_color[0], light.sun_color[1], light.sun_color[2]
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
        r, g, b = sh.apply_fog(r, g, b, ts, config.fog_density,
                               light.fog_color)
    skyr, skyg, skyb = sh.sky_color(dz, light.sky_top, light.sky_horizon)
    r = jnp.clip(jnp.where(hit, r, skyr), 0.0, 1.0)
    g = jnp.clip(jnp.where(hit, g, skyg), 0.0, 1.0)
    b = jnp.clip(jnp.where(hit, b, skyb), 0.0, 1.0)

    def plane(v):
        return v[:H * W].reshape(H, W)

    color = jnp.stack([plane(r), plane(g), plane(b)], axis=-1)
    depth = plane(jnp.where(hit, t_hit, jnp.inf))
    normal = jnp.stack([plane(jnp.where(hit, c, 0.0))
                        for c in (nx_s, ny_s, nz_s)], axis=-1)
    return Frame(color=color,
                 depth=depth if config.aux_buffers else None,
                 normal=normal if config.aux_buffers else None,
                 hit=plane(hit))


def render_frame_compact(scene: Scene, packed: PackedScene, camera: Camera,
                         config: RenderConfig, interpret: bool = False,
                         first_budget: int = 256) -> Frame:
    """Compacted-wavefront render (see module docstring)."""
    gmax = scene.pyr_flat[-1]
    return _render_compact_jit(
        camera, scene.light, packed.coarse, packed.columns, packed.shade,
        packed.albedo, gmax, config=config, n=scene.n, m=scene.m,
        levels=scene.levels, m5=packed.m5, l32=packed.l32,
        interpret=interpret, first_budget=first_budget)
