"""Shared masked-wavefront march step for the Pallas kernels.

Both TPU kernels — the fused screen-tile kernel (kernels/raycast.py) and
the compacted-wavefront march passes (kernels/compact.py) — execute the
same per-iteration max-mip step (SURVEY.md C10/C11; traversal math shared
with the oracle via hmrt_tpu.traversal.march, so hit decisions are
bit-identical to the fidelity spec). This module is that step, factored
once so the gather layout below changes in one place.

Gather cost model (what shapes this code — see BENCH_NOTES.md): Mosaic's
only dynamic vector access is a lane shuffle inside a (1, 128) row, so
every gather is a chunk loop whose cost is rows x channels. The layout in
kernels/packing.py therefore:

  * stores NO level-0 cascade block — a level-0 cell's pyramid max is
    exactly max of its 4 corner heights (core/pyramid.py cell_maxes), so
    level-0 lanes derive the skip test from the corner gather they need
    for the exact intersection anyway;
  * packs the level >= 1 cascade into 3 rows (the old layout scanned 11);
  * corner gathers (8 rows x 4 channels — the single priciest gather) and
    the exact intersector run under a scalar `lax.cond` per iteration and
    per served column, so iterations with no level-0 lane skip them
    entirely (measured: most iterations in coarse terrain).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from hmrt_tpu.traversal.intersect import BIG_T
from hmrt_tpu.traversal.march import (T_TOL, EPS_EXIT, ascent_levels,
                                      descend_cell, step_geometry)

# default for the scalar-cond guards around corner gathers + intersection.
# MEASURED (B3, 4096^2 HD): in the FUSED kernel at n_col=8 the guards LOSE
# 2.1x — nearly every iteration has a level-0 lane in some column, so the
# per-column jnp.any reductions and branch overhead outweigh the skipped
# work. They are a parameter (not a global) because the compacted path's
# sorted blocks have different phase statistics; env override for sweeps.
_COND_DEFAULT = os.environ.get("HMRT_COND", "0") == "1"


def _scalar_cond(use_conds, pred, then_fn, else_fn):
    if not use_conds:
        return then_fn()
    return jax.lax.cond(pred, then_fn, else_fn)


def _vreg_gather(buf, idx, rows):
    """Gather buf[idx >> 7, idx & 127] from a (rows, 128) VMEM value with
    per-lane indices, via a row-broadcast + lane-shuffle chunk loop
    (Mosaic's dynamic gather is lane-local, so rows are selected by mask)."""
    col = idx & 127
    row = idx >> 7
    acc = jnp.zeros(idx.shape, buf.dtype)
    for k in range(rows):
        rowk = jnp.broadcast_to(buf[k:k + 1, :], idx.shape)
        g = jnp.take_along_axis(rowk, col, axis=1)
        acc = jnp.where(row == k, g, acc)
    return acc


def _multi_gather(bufs, f):
    """Gather the same in-brick index from several (8,128) channel values
    sharing one chunk loop."""
    col = f & 127
    row = f >> 7
    accs = [jnp.zeros(f.shape, b.dtype) for b in bufs]
    for k in range(8):
        sel = row == k
        for i, b in enumerate(bufs):
            rowk = jnp.broadcast_to(b[k:k + 1, :], f.shape)
            g = jnp.take_along_axis(rowk, col, axis=1)
            accs[i] = jnp.where(sel, g, accs[i])
    return accs


def corner_scan(block, f0, corner_row):
    """Gather the 4 BAND-MAJOR corner channels of in-column index f0 from
    one (COL_ROWS, 128) record value: rows corner_row + 4*k + ch (see
    kernels/packing.py). Same 8-chunk x 4-channel op count as the old
    channel-major _multi_gather — only the row addressing differs."""
    col = f0 & 127
    row = f0 >> 7
    z = [jnp.zeros(f0.shape, jnp.float32) for _ in range(4)]
    for k in range(8):
        sel = row == k
        for ch in range(4):
            r = corner_row + 4 * k + ch
            rowk = jnp.broadcast_to(block[r:r + 1, :], f0.shape)
            g = jnp.take_along_axis(rowk, col, axis=1)
            z[ch] = jnp.where(sel, g, z[ch])
    return tuple(z)


def column_of(st, m5):
    """32-cell terrain column id of each lane's current cell (any level);
    dead lanes key as BIG_KEY so scalar min-selection skips them."""
    colx = jnp.clip((st["icx"] << st["lvl"]) >> 5, 0, m5 - 1)
    coly = jnp.clip((st["icy"] << st["lvl"]) >> 5, 0, m5 - 1)
    return jnp.where(st["alive"] != 0, coly * m5 + colx, BIG_KEY)


BIG_KEY = 2 ** 30  # plain int: jnp constants would be captured as kernel consts


def cascade_index(lvl, icx, icy, l32, offs):
    """In-record flat index of (lvl, icx, icy) in the level >= 1 cascade.

    Meaningless for lvl == 0 lanes (they have no cascade block); callers
    mask those through the corner path.
    """
    s_loc = jnp.maximum(32 >> lvl, 1)
    mask_l = s_loc - 1
    off = jnp.zeros(lvl.shape, jnp.int32)
    for l in range(1, l32):
        off = jnp.where(lvl == l, offs[l], off)
    return off + (icy & mask_l) * s_loc + (icx & mask_l)


def fine_gathers(col_scr, sels, cols_now, act, at0, lvl, fidx, f0, l32,
                 corner_row, casc_rows=3, use_conds=_COND_DEFAULT, base=0):
    """Gathers for the column demand loop serving columns `sels`.

    Returns (cmax, corners_fn):
      cmax       — the level >= 1 cascade value per lane (BIG_T for lanes
                   at lvl >= l32, forcing a safe descend — see note below);
      corners_fn — zero-arg callable producing (z00, z10, z01, z11) for
                   level-0 lanes, with a scalar-cond per served column so
                   columns without testing lanes skip the 8x4 chunk loop.

    Safety: a lane that enters the demand loop still at lvl >= l32 (phase A
    cap exhausted) has no cascade entry; returning BIG_T makes its skip
    test fail so it descends one level per iteration until it is back in
    range — graceful instead of a silently wrong (non-conservative) cmax.
    """
    shp = act.shape
    cmax = jnp.zeros(shp, jnp.float32)
    for c, sc in enumerate(sels):
        mine = cols_now == sc
        cm = _vreg_gather(col_scr[base + c, 0:casc_rows, :], fidx, casc_rows)
        cmax = jnp.where(mine, cm, cmax)
    cmax = jnp.where(lvl >= l32, BIG_T, cmax)

    def corners_fn():
        z = [jnp.zeros(shp, jnp.float32) for _ in range(4)]
        for c, sc in enumerate(sels):
            mine = cols_now == sc

            def gather(c=c, mine=mine, z=z):
                g = corner_scan(col_scr[base + c], f0, corner_row)
                return tuple(jnp.where(mine, g[i], z[i]) for i in range(4))

            def keep(z=z):
                return tuple(z)

            z = list(_scalar_cond(use_conds, jnp.any(act & at0 & mine),
                                  gather, keep))
        return tuple(z)

    return cmax, corners_fn


def subserve_gathers(col_scr, bank_masks, lvl, fidx, f0, l32, corner_row,
                     casc_rows=3, base=0):
    """Per-SUBLANE record gathers: `col_scr` is a (rows, 8*nb, 128)
    scratch where sublane s of row slice [r, 8b:8b+8, :] holds the row r
    of the b-th record serving sublane s (the demand loop DMAs nb column
    records per sublane — 8 independent demand streams). A single
    take-scan per bank then serves 8 different column records at once
    with NO per-column `mine` masking: Mosaic's dynamic lane gather
    operates on each (1, 128) row of a (8, 128) operand independently,
    so `col_scr[r, 8b:8b+8, :]` — whose 8 rows come from 8 different
    records — is gathered per-sublane for free.

    bank_masks: one per-lane bool plane per bank b >= 1 selecting lanes
    whose current record is bank b (bank 0 is the default; entry 0 is
    ignored). nb >= 2 exists because nb == 1 measured GREAT per-step
    cost but POOR density on B3 (0.257 vs 0.462 us/step, 20% vs 58%
    density): a marching lane crosses out of a 32x32 record in ~10-30
    steps and then stalls until every sublane drains, while the block-
    global 4-column serving gave crossing lanes continuity. A second
    per-sublane record restores that continuity at 2 takes/row instead
    of the per-column scan's n_col x (broadcast+take+select).

    vs fine_gathers: the corner scan drops from n_col x 8 rows x 4 ch x
    (broadcast+take+select) to 8 rows x 4 ch x nb x (take+select), while
    serving 8*nb columns instead of n_col. Values fetched are identical —
    only which lanes are served per iteration changes, so hit decisions
    stay bit-identical (serving policy is not arithmetic).
    """
    nb = len(bank_masks)

    def multi_bank(r, idx_col):
        g = jnp.take_along_axis(col_scr[r, base:base + 8, :],
                                idx_col, axis=1)
        for b in range(1, nb):
            gb = jnp.take_along_axis(
                col_scr[r, base + 8 * b:base + 8 * b + 8, :],
                idx_col, axis=1)
            g = jnp.where(bank_masks[b], gb, g)
        return g

    row_c = fidx >> 7
    col_c = fidx & 127
    cmax = jnp.zeros(f0.shape, jnp.float32)
    for r in range(casc_rows):
        cmax = jnp.where(row_c == r, multi_bank(r, col_c), cmax)
    # lanes still above the bricked levels have no cascade entry; BIG_T
    # forces a safe descend (same policy as fine_gathers)
    cmax = jnp.where(lvl >= l32, BIG_T, cmax)

    row = f0 >> 7
    col = f0 & 127

    def corners_fn():
        z = [jnp.zeros(f0.shape, jnp.float32) for _ in range(4)]
        for k in range(8):
            sel = row == k
            for ch in range(4):
                g = multi_bank(corner_row + 4 * k + ch, col)
                z[ch] = jnp.where(sel, g, z[ch])
        return tuple(z)

    return cmax, corners_fn


def band_gathers(col_scr, bank_masks, f0, band_rows=4, base=0):
    """Per-sublane BAND record corner gathers for the level-0 tail.

    A band record is `band_rows` consecutive cell rows of one 32x32
    column (band_rows in {4, 8, 16, 32} — 32 being the whole column,
    keyed per column, with a corner-rows-only DMA); under the band-major
    corner layout
    (kernels/packing.py) its corner rows are CONTIGUOUS, so each bank DMA
    is one (band_rows, 128) copy. `col_scr` is a (band_rows, 8*nb, 128)
    scratch: row slice [4k+ch, 8b:8b+8, :] holds corner channel ch of
    in-band chunk k of the b-th record serving each sublane. The gather
    scans band_rows//4 chunks x 4 channels per bank — at band_rows=4
    one take per channel (vs subserve_gathers' 8-chunk scan), at 8 two.

    The trade is gather ops vs record AREA (serve density): 32x4 bands
    (1/8 column area) measured 2205-3370 ms on B3 vs 2038 for full
    columns — lanes exit tiny records too fast; 32x8 (1/4 area) halves
    that penalty while still cutting the scan 4x. Values fetched are
    identical to the column-record path, so hit decisions stay bit-exact.
    """
    nb = len(bank_masks)
    col = f0 & 127
    chunks = band_rows // 4
    kin = (f0 >> 7) & (chunks - 1) if chunks > 1 else None

    def multi_bank(r):
        g = jnp.take_along_axis(col_scr[r, base:base + 8, :], col, axis=1)
        for b in range(1, nb):
            gb = jnp.take_along_axis(
                col_scr[r, base + 8 * b:base + 8 * b + 8, :],
                col, axis=1)
            g = jnp.where(bank_masks[b], gb, g)
        return g

    def corners_fn():
        z = [jnp.zeros(f0.shape, jnp.float32) for _ in range(4)]
        for k in range(chunks):
            sel = None if chunks == 1 else (kin == k)
            for ch in range(4):
                g = multi_bank(4 * k + ch)
                z[ch] = g if sel is None else jnp.where(sel, g, z[ch])
        return tuple(z)

    return corners_fn


def wavefront_step(st, act, ox, oy, oz, dx, dy, dz, inv_x, inv_y, t1, gmax,
                   cmax, corners_fn=None, *, m, asc_cap, lvl_ceiling,
                   intersector=None, ascend_on_test_miss=False,
                   use_conds=_COND_DEFAULT):
    """One lockstep masked step of the max-mip wavefront for lanes in `act`.

    Coarse phase (corners_fn=None): lanes are at lvl >= 1, skip/descend only.
    Fine phase: level-0 lanes derive their cell max from the corners and run
    the exact intersector, both under one scalar cond (skipped when no
    active lane is at level 0 this iteration).

    `st` carries i32 masks (Mosaic cannot yield i1 vectors through
    scf.while). Returns a new st dict; the caller owns loop control.
    """
    t, lvl, icx, icy = st["t"], st["lvl"], st["icx"], st["icy"]
    t_exit, nx, ny, bnd = step_geometry(ox, oy, dx, dy, icx, icy, lvl,
                                        inv_x, inv_y)
    t_exit_c = jnp.minimum(t_exit, t1)
    zmin = oz + jnp.minimum(t * dz, t_exit_c * dz)

    if corners_fn is None:
        skip = zmin > cmax
        descend = act & ~skip
        advance = act & skip
        asc_src = advance
        hit_now = None
    else:
        at0 = lvl == 0

        def with_test():
            z00, z10, z01, z11 = corners_fn()
            # level-0 cell max from corners: same expression as
            # core/pyramid.cell_maxes => bit-identical skip test
            cmax0 = jnp.maximum(jnp.maximum(z00, z10),
                                jnp.maximum(z01, z11))
            h, t_c = intersector(ox, oy, oz, dx, dy, dz, icx, icy,
                                 z00, z10, z01, z11,
                                 t - T_TOL, t_exit_c + T_TOL)
            return (jnp.where(at0, cmax0, cmax), h.astype(jnp.int32), t_c)

        def without_test():
            return (cmax, jnp.zeros(act.shape, jnp.int32),
                    jnp.full(act.shape, BIG_T, jnp.float32))

        cmaxf, hraw, t_c = _scalar_cond(use_conds, jnp.any(act & at0),
                                        with_test, without_test)
        skip = zmin > cmaxf
        descend = act & ~skip & ~at0
        test = act & ~skip & at0
        hit_now = (hraw != 0) & test
        advance = act & ~descend & ~hit_now
        asc_src = advance if ascend_on_test_miss else (act & skip)
        if "nskip" in st:  # perf-diagnosis planes (kernels pass them
            st = dict(st,  # through st in debug mode only)
                      nskip=st["nskip"] + (act & skip & at0).astype(jnp.int32),
                      ntest=st["ntest"] + test.astype(jnp.int32))

    dcx, dcy = descend_cell(ox, oy, dx, dy, t, icx, icy, lvl)
    asc = jnp.where(asc_src, jnp.minimum(ascent_levels(bnd), asc_cap), 0)
    asc = jnp.minimum(asc, lvl_ceiling - lvl)
    new_lvl = jnp.where(descend, lvl - 1, lvl + asc)
    adv_x = nx >> asc
    adv_y = ny >> asc
    new_icx = jnp.where(descend, dcx, jnp.where(advance, adv_x, icx))
    new_icy = jnp.where(descend, dcy, jnp.where(advance, adv_y, icy))
    new_t = jnp.where(advance, jnp.maximum(t, t_exit_c), t)
    new_side = m >> new_lvl
    # exact escape test: above global max and climbing => miss
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
    if hit_now is None:
        st["alive"] = st["alive"] * (1 - out.astype(jnp.int32))
    else:
        st["alive"] = (st["alive"]
                       * (1 - hit_now.astype(jnp.int32))
                       * (1 - out.astype(jnp.int32)))
        st["hit"] = jnp.maximum(st["hit"], hit_now.astype(jnp.int32))
        st["t_hit"] = jnp.where(hit_now, t_c, st["t_hit"])
        st["hx"] = jnp.where(hit_now, icx, st["hx"])
        st["hy"] = jnp.where(hit_now, icy, st["hy"])
    return st


def wavefront_step_l0_relaxed(st, act, ox, oy, oz, dx, dy, dz, inv_x, inv_y,
                              t1, gmax, corners_fn, *, m, intersector,
                              surface, stride):
    """One masked step of the RELAXED level-0 tail (the fidelity-bar
    experiment, VERDICT r3 next #4 — opt-in, OFF by default).

    The floor analysis (BENCH_NOTES.md) shows the exact tail is ~1 corner
    gather per CELL on grazing rays and that no conservative bound can skip
    there (cone fields / span bounds / cell maxima all fire ~0%). This step
    trades bit-exactness for gathers-per-cell < 1:

      mode A (stride sampling): one gather per `stride` cells — evaluate
        the cell surface height at the ray's sample point (the SAME
        piecewise surface the exact intersector tests, via
        traversal.intersect.SURFACES) and compare against the ray height.
        While above, jump the sample `stride` cells along the dominant
        axis. On a below-sample, backtrack to the last above-sample and
        enter mode B over the bracket.
      mode B (exact in-bracket walk): identical math to wavefront_step_l0
        (same per-cell entry/exit t from the origin, same intersector,
        same T_TOL window), capped at the bracket end: when the walk's t
        passes the below-sample without a hit (intersector/sample
        tolerance disagreement — rare by the continuity argument in
        intersect.py), it returns to mode A from where it stands.

    Fidelity contract: a below-sample implies a crossing inside the
    bracket (the surface is continuous and the sampled evaluator matches
    the intersector), so every DETECTED bracket yields the exact first
    hit within it, with the same t the exact march computes (per-cell t
    values are origin-anchored and bit-identical). The ONLY error mode is
    tunneling: the surface rising above the ray and dipping back below
    between two consecutive above-samples — a feature narrower than
    `stride` cells along the ray. No false hits exist. Measured fidelity
    deltas: tools/fidelity_relaxed.py.

    Extra i32/f32 state planes (kernel-local, see kernels/compact.py):
    rmode (0=stride, 1=walk), tprev (last above-sample t), wend (bracket
    end t).
    """
    t, icx, icy = st["t"], st["icx"], st["icy"]
    rmode, tprev, wend = st["rmode"], st["tprev"], st["wend"]

    # bracket exhausted -> resume stride sampling from where the walk stands
    walk0 = act & (rmode != 0)
    exhaust = walk0 & (t > wend + T_TOL)
    rmode = jnp.where(exhaust, 0, rmode)
    tprev = jnp.where(exhaust, t, tprev)
    walk = act & (rmode != 0)
    samp = act & (rmode == 0)

    z00, z10, z01, z11 = corners_fn()

    # ---- mode B: exact DDA walk (same expressions as wavefront_step_l0) ----
    pos_x = dx > 0.0
    pos_y = dy > 0.0
    bx = icx + pos_x.astype(jnp.int32)
    by = icy + pos_y.astype(jnp.int32)
    tx = (bx.astype(jnp.float32) - ox) * inv_x
    ty = (by.astype(jnp.float32) - oy) * inv_y
    tx = jnp.where(jnp.abs(dx) < 1e-20, BIG_T, tx)
    ty = jnp.where(jnp.abs(dy) < 1e-20, BIG_T, ty)
    axis_x = tx <= ty
    t_exit = jnp.minimum(tx, ty)
    nx = jnp.where(axis_x, icx + jnp.where(pos_x, 1, -1), icx)
    ny = jnp.where(axis_x, icy, icy + jnp.where(pos_y, 1, -1))
    t_exit_c = jnp.minimum(t_exit, t1)
    h, t_c = intersector(ox, oy, oz, dx, dy, dz, icx, icy,
                         z00, z10, z01, z11, t - T_TOL, t_exit_c + T_TOL)
    hit_now = h & walk
    wadv = walk & ~hit_now
    wt = jnp.maximum(t, t_exit_c)
    wesc = wadv & (oz + wt * dz > gmax) & (dz > 0.0)
    wout = (wadv & ((t_exit >= t1 - EPS_EXIT)
                    | (nx < 0) | (nx >= m) | (ny < 0) | (ny >= m))
            | wesc)

    # ---- mode A: stride sampling at the current position ----
    fxs = ox + t * dx - icx.astype(jnp.float32)
    fys = oy + t * dy - icy.astype(jnp.float32)
    zs = surface(fxs, fys, z00, z10, z01, z11)
    below = samp & (oz + t * dz <= zs)
    above = samp & ~below
    stride_t = stride * jnp.minimum(jnp.abs(inv_x), jnp.abs(inv_y))
    ts_new = jnp.maximum(t, jnp.minimum(t + stride_t, t1 - EPS_EXIT))
    sout = above & (t >= t1 - 2.0 * EPS_EXIT)
    sesc = above & (oz + ts_new * dz > gmax) & (dz > 0.0)
    sadv = above & ~sout & ~sesc
    sx = jnp.clip(jnp.floor(ox + ts_new * dx).astype(jnp.int32), 0, m - 1)
    sy = jnp.clip(jnp.floor(oy + ts_new * dy).astype(jnp.int32), 0, m - 1)
    # backtrack: the bracket start is the last above-sample
    bwx = jnp.clip(jnp.floor(ox + tprev * dx).astype(jnp.int32), 0, m - 1)
    bwy = jnp.clip(jnp.floor(oy + tprev * dy).astype(jnp.int32), 0, m - 1)

    new_t = jnp.where(wadv, wt, t)
    new_t = jnp.where(sadv, ts_new, new_t)
    new_t = jnp.where(below, tprev, new_t)
    new_icx = jnp.where(wadv, nx, icx)
    new_icx = jnp.where(sadv, sx, new_icx)
    new_icx = jnp.where(below, bwx, new_icx)
    new_icy = jnp.where(wadv, ny, icy)
    new_icy = jnp.where(sadv, sy, new_icy)
    new_icy = jnp.where(below, bwy, new_icy)

    dead = hit_now | wout | sout | sesc
    st = dict(st)
    st["t"] = new_t
    st["icx"] = new_icx
    st["icy"] = new_icy
    st["rmode"] = jnp.where(below, 1, rmode)
    st["tprev"] = jnp.where(sadv, t, tprev)
    st["wend"] = jnp.where(below, t, wend)
    st["alive"] = st["alive"] * (1 - dead.astype(jnp.int32))
    st["hit"] = jnp.maximum(st["hit"], hit_now.astype(jnp.int32))
    st["t_hit"] = jnp.where(hit_now, t_c, st["t_hit"])
    st["hx"] = jnp.where(hit_now, icx, st["hx"])
    st["hy"] = jnp.where(hit_now, icy, st["hy"])
    if "nskip" in st:
        st = dict(st,
                  nskip=st["nskip"] + sadv.astype(jnp.int32),
                  ntest=st["ntest"] + walk.astype(jnp.int32))
    return st


def wavefront_step_l0(st, act, ox, oy, oz, dx, dy, dz, inv_x, inv_y, t1,
                      gmax, corners_fn, *, m, intersector):
    """Level-0-only masked step: uniform DDA + exact test, NO pyramid.

    The tail of the compacted march is measured 99.9% at level 0 with a
    0.0-0.4% skip rate (tools/diag_b3.py; the level-0 cell max sits above
    a grazing ray on essentially every cell), i.e. it is brute-force DDA
    with an exact test per cell. This step drops everything the pyramid
    needs — cascade gather, descend, ascent, per-lane level arithmetic —
    for lanes the caller has already forced to level 0.

    Exactness: the skip test, test window, and intersector are the same
    expressions as wavefront_step's level-0 branch, and never ascending
    is a pure policy choice (the skip test stays conservative), so hit
    decisions are bit-identical to the oracle.
    """
    t, icx, icy = st["t"], st["icx"], st["icy"]
    pos_x = dx > 0.0
    pos_y = dy > 0.0
    bx = icx + pos_x.astype(jnp.int32)
    by = icy + pos_y.astype(jnp.int32)
    tx = (bx.astype(jnp.float32) - ox) * inv_x
    ty = (by.astype(jnp.float32) - oy) * inv_y
    tx = jnp.where(jnp.abs(dx) < 1e-20, BIG_T, tx)
    ty = jnp.where(jnp.abs(dy) < 1e-20, BIG_T, ty)
    axis_x = tx <= ty
    t_exit = jnp.minimum(tx, ty)
    nx = jnp.where(axis_x, icx + jnp.where(pos_x, 1, -1), icx)
    ny = jnp.where(axis_x, icy, icy + jnp.where(pos_y, 1, -1))
    t_exit_c = jnp.minimum(t_exit, t1)
    zmin = oz + jnp.minimum(t * dz, t_exit_c * dz)

    z00, z10, z01, z11 = corners_fn()
    cmax0 = jnp.maximum(jnp.maximum(z00, z10), jnp.maximum(z01, z11))
    h, t_c = intersector(ox, oy, oz, dx, dy, dz, icx, icy,
                         z00, z10, z01, z11, t - T_TOL, t_exit_c + T_TOL)
    skip = zmin > cmax0
    hit_now = h & act & ~skip
    advance = act & ~hit_now

    new_t = jnp.maximum(t, t_exit_c)
    escaped = advance & (oz + new_t * dz > gmax) & (dz > 0.0)
    out = (advance & ((t_exit >= t1 - EPS_EXIT)
                      | (nx < 0) | (nx >= m) | (ny < 0) | (ny >= m))
           | escaped)

    st = dict(st)
    st["t"] = jnp.where(advance, new_t, t)
    st["icx"] = jnp.where(advance, nx, icx)
    st["icy"] = jnp.where(advance, ny, icy)
    st["alive"] = (st["alive"]
                   * (1 - hit_now.astype(jnp.int32))
                   * (1 - out.astype(jnp.int32)))
    st["hit"] = jnp.maximum(st["hit"], hit_now.astype(jnp.int32))
    st["t_hit"] = jnp.where(hit_now, t_c, st["t_hit"])
    st["hx"] = jnp.where(hit_now, icx, st["hx"])
    st["hy"] = jnp.where(hit_now, icy, st["hy"])
    if "nskip" in st:
        st = dict(st,
                  nskip=st["nskip"] + (act & skip).astype(jnp.int32),
                  ntest=st["ntest"] + (act & ~skip).astype(jnp.int32))
    return st
