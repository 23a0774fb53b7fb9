"""Instrumented max-mip march: where does fine-level work go, and how much
of it could a cone jump (core/cone.py) remove?

Replicates traversal/march.march_maxmip's loop with extra accumulators:
per fine-level step, the hypothetical safe jump k (cone_safe_cells) is
computed and histogrammed, split by skip-lanes vs test-miss lanes. This
sizes the cone lever on a B3-like view BEFORE kernel work (round-3 task
1's 'step-count histogram before/after' evidence).

Usage: python tools/diag_cone.py [--n 1024] [--res 480x270] [--radius 64]
"""

import argparse

import numpy as np

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--res", default="480x270")
    ap.add_argument("--radius", type=int, default=64)
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from hmrt_tpu.api.scene import make_scene
    from hmrt_tpu.core.cone import build_cone, cone_safe_cells
    from hmrt_tpu.io.heightmap import procedural_terrain
    from hmrt_tpu.traversal.intersect import BIG_T, INTERSECTORS
    from hmrt_tpu.traversal.march import (EPS_EXIT, T_TOL, ascent_levels,
                                          corner_heights, descend_cell,
                                          entry_cell, ray_box_range,
                                          ray_inverses, step_geometry)
    from hmrt_tpu.types import Camera

    n = args.n
    W, H = (int(v) for v in args.res.split("x"))
    R = args.radius
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
    cone = build_cone(sc.heights, R).reshape(-1)

    from hmrt_tpu.core.pyramid import flat_index
    intersector = INTERSECTORS["triangle"]
    world_max = float(n - 1)
    t0, t1, valid = ray_box_range(ox, oy, dx, dy, world_max)
    inv_x, inv_y = ray_inverses(dx, dy)
    inv_vmax = 1.0 / jnp.maximum(jnp.maximum(jnp.abs(dx), jnp.abs(dy)), 1e-20)
    g_cheb = dz * inv_vmax
    global_max = pyr_flat[-1]
    sky = (oz + t0 * dz > global_max) & (dz >= 0.0)
    valid = valid & ~sky
    top = levels - 1
    top_arr = jnp.full((P,), top, jnp.int32)
    icx0, icy0 = entry_cell(ox, oy, dx, dy, t0, top_arr, m >> top)

    NB = 16  # k-histogram buckets: 0,1,2,3,...,>=NB-1
    state = dict(t=jnp.where(valid, t0, BIG_T), lvl=top_arr, icx=icx0,
                 icy=icy0, alive=valid, i=jnp.int32(0),
                 work=jnp.int32(0), fine=jnp.int32(0),
                 fine_skip=jnp.int32(0), fine_miss=jnp.int32(0),
                 khist_skip=jnp.zeros(NB, jnp.int32),
                 khist_miss=jnp.zeros(NB, jnp.int32),
                 ksum_skip=jnp.float32(0), ksum_miss=jnp.float32(0))

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

        # ---- instrumentation: hypothetical cone jump for fine lanes ----
        capex = jnp.take(cone, jnp.clip(icy, 0, n - 2) * n
                         + jnp.clip(icx, 0, n - 2), mode="clip")
        z_e = oz + t_exit_c * dz
        kj = cone_safe_cells(z_e, z00, capex, g_cheb, R)
        kjc = jnp.clip(kj, 0, NB - 1)
        fs = advance & at_fine & skip
        fm = advance & at_fine & ~skip
        oneh = jax.nn.one_hot(kjc, NB, dtype=jnp.int32)
        st_new = dict(st)
        st_new["khist_skip"] = st["khist_skip"] + jnp.sum(
            oneh * fs[:, None].astype(jnp.int32), axis=0)
        st_new["khist_miss"] = st["khist_miss"] + jnp.sum(
            oneh * fm[:, None].astype(jnp.int32), axis=0)
        st_new["ksum_skip"] = st["ksum_skip"] + jnp.sum(
            jnp.where(fs, kj, 0).astype(jnp.float32))
        st_new["ksum_miss"] = st["ksum_miss"] + jnp.sum(
            jnp.where(fm, kj, 0).astype(jnp.float32))
        st_new["fine"] = st["fine"] + jnp.sum(
            (alive & at_fine).astype(jnp.int32))
        st_new["fine_skip"] = st["fine_skip"] + jnp.sum(fs.astype(jnp.int32))
        st_new["fine_miss"] = st["fine_miss"] + jnp.sum(fm.astype(jnp.int32))

        dcx, dcy = descend_cell(ox, oy, dx, dy, t, icx, icy, lvl)
        asc = jnp.where(alive & skip & advance, ascent_levels(bnd), 0)
        asc = jnp.minimum(asc, (levels - 1) - lvl)
        new_lvl = jnp.where(descend, lvl - 1, lvl + asc)
        adv_x = nx >> asc
        adv_y = ny >> asc
        new_icx = jnp.where(descend, dcx, jnp.where(advance, adv_x, icx))
        new_icy = jnp.where(descend, dcy, jnp.where(advance, adv_y, icy))
        new_t = jnp.where(advance, jnp.maximum(t, t_exit_c), t)
        new_side = m >> new_lvl
        escaped = advance & (oz + new_t * dz > global_max) & (dz > 0.0)
        out = advance & ((t_exit >= t1 - EPS_EXIT)
                         | (new_icx < 0) | (new_icx >= new_side)
                         | (new_icy < 0) | (new_icy >= new_side)) | escaped
        st_new.update(t=new_t, lvl=jnp.where(alive, new_lvl, lvl),
                      icx=jnp.where(alive, new_icx, icx),
                      icy=jnp.where(alive, new_icy, icy),
                      alive=alive & ~hit_now & ~out, i=st["i"] + 1,
                      work=st["work"] + jnp.sum(alive.astype(jnp.int32)))
        return st_new

    fin = jax.lax.while_loop(cond, body, state)
    work = int(fin["work"])
    fine = int(fin["fine"])
    print(f"iters={int(fin['i'])} work={work} fine={fine} "
          f"({100 * fine / max(work, 1):.1f}% of work)")
    for name in ("skip", "miss"):
        cnt = int(fin[f"fine_{name}"])
        hist = np.asarray(fin[f"khist_{name}"])
        ksum = int(fin[f"ksum_{name}"])
        print(f"fine {name}: {cnt} steps ({100 * cnt / max(work, 1):.1f}% of "
              f"work), mean hypothetical k={ksum / max(cnt, 1):.2f}")
        tot = hist.sum() or 1
        print("  k histogram:",
              " ".join(f"{i}:{100 * v / tot:.1f}%"
                       for i, v in enumerate(hist) if v > 0))
    # upper bound on work removable by jumping: every fine step with k>=2
    # collapses k cells into 1 iteration
    for name in ("skip", "miss"):
        hist = np.asarray(fin[f"khist_{name}"], np.float64)
        ks = np.arange(len(hist))
        saved = float((hist[2:] * (ks[2:] - 1)).sum())
        # bucket NB-1 aggregates k>=NB-1; underestimates savings there
        print(f"fine {name}: step-savings lower bound if jumping k>=2: "
              f"{saved:.0f} (={100 * saved / max(work, 1):.1f}% of work)")


if __name__ == "__main__":
    main()
