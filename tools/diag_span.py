"""Measure the 2-line span-jump lever on a B3-like view.

The cone field measured ZERO effect (tools/diag_cone.py): 96% of work is
fine-level exact-test misses where the ray sits BELOW the cell's max
corner, so any bound anchored at cell/corner maxima cannot skip. The
tighter bound that can: for a ray moving along its dominant axis at
fractional lateral offset f, both intersectors' surfaces inside a cell
are bounded by (1-f)*E0(s) + f*E1(s) where E0/E1 are the two adjacent
grid LINE profiles (bilinear is exactly linear in the lateral coordinate;
each triangle's value is a convex combination dominated the same way).
Maxima of E0/E1 over a span of cells are 1D precomputable, so a ray that
stays in one line pair for L cells can be tested against

    min(z_in, z_out) > max over f in [f_in, f_out] of
                       (1-f)*max(E0 span) + f*max(E1 span)

and jump L cells on pass — laterally EXACT (no uphill pollution), which
is what the hugging band needs.

This tool runs the real max-mip march with the span jump bolted on
(adaptive L = steps until the ray leaves its current line pair, capped),
reports work with/without, and checks hit parity vs the plain march.

Usage: python tools/diag_span.py [--n 1024] [--res 320x180] [--cap 16]
"""

import argparse

import numpy as np

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--res", default="480x270")
    ap.add_argument("--cap", type=int, default=16)
    ap.add_argument("--min-span", type=int, default=4)
    args = ap.parse_args()
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from hmrt_tpu.api.scene import make_scene
    from hmrt_tpu.io.heightmap import procedural_terrain
    from hmrt_tpu.traversal.intersect import BIG_T, INTERSECTORS
    from hmrt_tpu.traversal.march import (EPS_EXIT, T_TOL, ascent_levels,
                                          corner_heights, descend_cell,
                                          entry_cell, march_maxmip,
                                          ray_box_range, ray_inverses,
                                          step_geometry)
    from hmrt_tpu.core.pyramid import flat_index
    from hmrt_tpu.types import Camera

    n = args.n
    W, H = (int(v) for v in args.res.split("x"))
    CAP = args.cap
    MIN_SPAN = args.min_span
    h = procedural_terrain(n, seed=3)
    sc = make_scene(h)
    zmax = float(np.asarray(h).max())
    cam = Camera.create(eye=(n * 0.5, -n * 0.25, zmax + n * 0.06),
                        target=(n * 0.5, n * 0.5, float(np.asarray(h).mean())),
                        fov_y_deg=55.0)
    eye, dirs = cam.rays(H, W)
    d = np.asarray(dirs).reshape(-1, 3)
    P = d.shape[0]
    ox = jnp.full((P,), float(eye[0]))
    oy = jnp.full((P,), float(eye[1]))
    oz = jnp.full((P,), float(eye[2]))
    dx, dy, dz = (jnp.asarray(d[:, i]) for i in range(3))
    hf = sc.heights.reshape(-1)
    pyr_flat = sc.pyr_flat
    m, levels = sc.m, sc.levels
    intersector = INTERSECTORS["triangle"]
    world_max = float(n - 1)
    t0, t1, valid = ray_box_range(ox, oy, dx, dy, world_max)
    inv_x, inv_y = ray_inverses(dx, dy)
    global_max = pyr_flat[-1]
    sky = (oz + t0 * dz > global_max) & (dz >= 0.0)
    valid = valid & ~sky
    top = levels - 1
    top_arr = jnp.full((P,), top, jnp.int32)
    icx0, icy0 = entry_cell(ox, oy, dx, dy, t0, top_arr, m >> top)

    ydom = jnp.abs(dy) >= jnp.abs(dx)
    # per-lane constants for span geometry along the dominant axis
    d_dom = jnp.where(ydom, dy, dx)
    d_lat = jnp.where(ydom, dx, dy)
    inv_dom = jnp.where(ydom, inv_y, inv_x)

    state = dict(t=jnp.where(valid, t0, BIG_T), lvl=top_arr, icx=icx0,
                 icy=icy0, alive=valid,
                 hit=jnp.zeros((P,), bool),
                 t_hit=jnp.full((P,), BIG_T, jnp.float32),
                 hx=jnp.zeros((P,), jnp.int32), hy=jnp.zeros((P,), jnp.int32),
                 i=jnp.int32(0), work=jnp.int32(0),
                 jumps=jnp.int32(0), jumped=jnp.float32(0),
                 tries=jnp.int32(0))

    def cond(st):
        return (st["i"] < 16 * n) & jnp.any(st["alive"])

    def body(st):
        t, lvl, alive = st["t"], st["lvl"], st["alive"]
        icx, icy = st["icx"], st["icy"]
        t_exit, nx, ny, bnd = step_geometry(ox, oy, dx, dy, icx, icy, lvl,
                                            inv_x, inv_y)
        t_exit_c = jnp.minimum(t_exit, t1)
        zmin = oz + jnp.minimum(t * dz, t_exit_c * dz)
        side = m >> lvl
        idx = flat_index(m, lvl, jnp.clip(icy, 0, side - 1),
                         jnp.clip(icx, 0, side - 1))
        cmax = jnp.take(pyr_flat, idx, mode="clip")
        skip = zmin > cmax
        at_fine = lvl == 0
        descend = ~skip & ~at_fine
        test = ~skip & at_fine & alive
        z00, z10, z01, z11 = corner_heights(hf, n, icx, icy)
        hit_now, t_c = intersector(ox, oy, oz, dx, dy, dz, icx, icy,
                                   z00, z10, z01, z11,
                                   t - T_TOL, t_exit_c + T_TOL)
        hit_now = hit_now & test
        advance = alive & ~descend & ~hit_now

        # ----- span jump attempt (fine advancing lanes) -----
        # dominant-axis coords: s = dominant cell index, l = lateral
        s0 = jnp.where(ydom, icy, icx)
        l0 = jnp.where(ydom, icx, icy)
        pos_dom = d_dom > 0
        # L_pair: dominant steps until the LATERAL cell index changes,
        # from the position at the current cell's dominant exit
        t_dexit = ((s0 + jnp.where(pos_dom, 1, 0)).astype(jnp.float32)
                   - jnp.where(ydom, oy, ox)) * inv_dom
        lat_at = (jnp.where(ydom, ox, oy)
                  + t_dexit * d_lat)
        lat_frac = lat_at - l0.astype(jnp.float32)
        dlat = jnp.abs(d_lat) * jnp.abs(inv_dom)    # lateral drift per step
        room = jnp.where(d_lat > 0, 1.0 - lat_frac, lat_frac)
        L_pair = jnp.where(dlat > 1e-9,
                           jnp.floor(room / jnp.maximum(dlat, 1e-9)),
                           1e9)
        L = jnp.minimum(L_pair, float(CAP)).astype(jnp.int32)
        # stay in bounds along the dominant axis (need samples to s0+L+1)
        sN = jnp.where(pos_dom, (n - 2) - s0, s0)
        L = jnp.minimum(L, sN)
        # the ray must still be in lateral cell l0 at its dominant exit
        # (a lateral DDA crossing before it invalidates the line pair)
        lat_ok = jnp.floor(lat_at).astype(jnp.int32) == l0
        eligible = advance & at_fine & lat_ok & (L >= MIN_SPAN)

        # covered cells: s0+1 .. s0+L (sign-adjusted); samples one wider
        Lc = jnp.maximum(L, 1)
        smin = jnp.where(pos_dom, s0 + 1, s0 - Lc)
        smax = jnp.where(pos_dom, s0 + Lc + 1, s0)
        # line maxima of both adjacent lines over the span (gather loop)
        lat1 = jnp.clip(l0 + 1, 0, n - 1)
        l0c = jnp.clip(l0, 0, n - 1)

        def lm_body(s, carry):
            m0, m1 = carry
            ss = jnp.clip(smin + s, 0, n - 1)
            use = s <= (smax - smin)
            i0 = jnp.where(ydom, ss * n + l0c, l0c * n + ss)
            i1 = jnp.where(ydom, ss * n + lat1, lat1 * n + ss)
            v0 = jnp.take(hf, i0, mode="clip")
            v1 = jnp.take(hf, i1, mode="clip")
            m0 = jnp.where(use, jnp.maximum(m0, v0), m0)
            m1 = jnp.where(use, jnp.maximum(m1, v1), m1)
            return m0, m1

        neg = jnp.full((P,), -3e38, jnp.float32)
        M0, M1 = jax.lax.fori_loop(0, CAP + 2, lm_body, (neg, neg))

        # ray exits the covered span at the far boundary of cell s0 +- L
        t_span = ((s0 + jnp.where(pos_dom, Lc + 1, -Lc)).astype(jnp.float32)
                  - jnp.where(ydom, oy, ox)) * inv_dom
        t_span = jnp.minimum(t_span, t1)
        z_in = oz + t * dz
        z_out = oz + t_span * dz
        f_in = jnp.clip(lat_frac, 0.0, 1.0)
        f_out = jnp.clip(lat_frac + Lc.astype(jnp.float32) * dlat
                         * jnp.sign(d_lat) * jnp.sign(1.0), 0.0, 1.0)
        # max over f in [f_in, f_out] of (1-f)M0 + f M1 = max at endpoints
        b_in = (1.0 - f_in) * M0 + f_in * M1
        b_out = (1.0 - f_out) * M0 + f_out * M1
        bound = jnp.maximum(b_in, b_out)
        z_min_span = jnp.minimum(z_in, z_out)
        passed = eligible & (z_min_span > bound + 1e-4) & (t_span > t)

        dcx, dcy = descend_cell(ox, oy, dx, dy, t, icx, icy, lvl)
        asc = jnp.where(alive & skip & advance, ascent_levels(bnd), 0)
        asc = jnp.minimum(asc, (levels - 1) - lvl)
        new_lvl = jnp.where(descend, lvl - 1, lvl + asc)
        adv_x = nx >> asc
        adv_y = ny >> asc
        new_icx = jnp.where(descend, dcx, jnp.where(advance, adv_x, icx))
        new_icy = jnp.where(descend, dcy, jnp.where(advance, adv_y, icy))
        new_t = jnp.where(advance, jnp.maximum(t, t_exit_c), t)

        # apply the jump: land in the first UNcovered cell, entered at its
        # boundary t_span (dominant index s0 +- (L+1); lateral from floor)
        jy_dom = s0 + jnp.where(pos_dom, Lc + 1, -(Lc + 1))
        jlat = jnp.clip(jnp.floor(
            jnp.where(ydom, ox + t_span * dx, oy + t_span * dy)
        ).astype(jnp.int32), 0, m - 1)
        jxx = jnp.where(ydom, jlat, jy_dom)
        jyy = jnp.where(ydom, jy_dom, jlat)
        new_t = jnp.where(passed, t_span, new_t)
        new_icx = jnp.where(passed, jxx, new_icx)
        new_icy = jnp.where(passed, jyy, new_icy)
        new_lvl = jnp.where(passed, 0, new_lvl)

        new_side = m >> new_lvl
        escaped = advance & (oz + new_t * dz > global_max) & (dz > 0.0)
        out = (advance & ~passed & ((t_exit >= t1 - EPS_EXIT)
                                    | (new_icx < 0) | (new_icx >= new_side)
                                    | (new_icy < 0) | (new_icy >= new_side))
               | (passed & (t_span >= t1 - EPS_EXIT)) | escaped)
        return dict(
            t=new_t, lvl=jnp.where(alive, new_lvl, lvl),
            icx=jnp.where(alive, new_icx, icx),
            icy=jnp.where(alive, new_icy, icy),
            alive=alive & ~hit_now & ~out,
            hit=st["hit"] | hit_now,
            t_hit=jnp.where(hit_now, t_c, st["t_hit"]),
            hx=jnp.where(hit_now, icx, st["hx"]),
            hy=jnp.where(hit_now, icy, st["hy"]),
            i=st["i"] + 1,
            work=st["work"] + jnp.sum(alive.astype(jnp.int32)),
            jumps=st["jumps"] + jnp.sum(passed.astype(jnp.int32)),
            jumped=st["jumped"] + jnp.sum(
                jnp.where(passed, Lc, 0).astype(jnp.float32)),
            tries=st["tries"] + jnp.sum(eligible.astype(jnp.int32)))

    fin = jax.lax.while_loop(cond, body, state)

    ref = march_maxmip(ox, oy, oz, dx, dy, dz, pyr_flat, hf, n=n, m=m,
                       levels=levels, max_steps=16 * n)
    hits_ok = bool((np.asarray(fin["hit"]) == np.asarray(ref.hit)).all())
    mh = np.asarray(ref.hit)
    cells_ok = bool((np.asarray(fin["hx"])[mh] == np.asarray(ref.cx)[mh]).all()
                    and (np.asarray(fin["hy"])[mh]
                         == np.asarray(ref.cy)[mh]).all())
    print(f"plain work={int(ref.work)} iters={int(ref.steps)}")
    print(f"span  work={int(fin['work'])} iters={int(fin['i'])} "
          f"ratio={int(fin['work']) / max(int(ref.work), 1):.3f}")
    print(f"jumps={int(fin['jumps'])} tries={int(fin['tries'])} "
          f"pass_rate={int(fin['jumps']) / max(int(fin['tries']), 1):.3f} "
          f"mean_jump={float(fin['jumped']) / max(int(fin['jumps']), 1):.2f}")
    print(f"hit parity: {hits_ok}, cell parity: {cells_ok}")


if __name__ == "__main__":
    main()
