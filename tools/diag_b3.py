#!/usr/bin/env python
"""Per-round diagnostics for the compact B3 path: density, iteration and
level-0 stats per march pass, plus wall time of each phase (passes, sorts)
measured separately (salted fetch timing, same hazards as bench/timing.py).

Usage: python tools/diag_b3.py [--map 4096] [--res 1920x1080]
                               [--sched 0,2,512,4]
"""
import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *a, **k):
    """Time one call, forcing completion with ONE scalar value fetch
    (device-side sum; per-array host fetches over the tunnel cost ~30 ms
    EACH and would dominate). The caller salts the chain inputs per
    repetition so the tunnel cannot dedup repeated dispatches."""
    t0 = time.perf_counter()
    out = fn(*a, **k)
    leaves = jax.tree.leaves(out)
    float(jnp.sum(leaves[1][:1024]))
    return out, (time.perf_counter() - t0) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--map", type=int, default=4096)
    ap.add_argument("--res", default="1920x1080")
    ap.add_argument("--sched", default="0,2,512,4")
    ap.add_argument("--prefixes", default="",
                    help="comma list of per-round population DIVISORS "
                         "(kernels/compact.py round_prefixes); overrides "
                         "the sched round count; a full-population guard "
                         "pass is appended")
    ap.add_argument("--cam", default="b3", choices=["b3", "oblique"],
                    help="camera preset: b3 = the grazing bench camera; "
                         "oblique = check_b2b4's high static orbit-style "
                         "view (the l0_tail auto-mispredict regime — use "
                         "with --map 8192 to capture the survivor level "
                         "mix that should calibrate L0_TAIL_AUTO_THRESH)")
    args = ap.parse_args()
    # sched format = sweep_b3's (r4, post-prune):
    # fb,rounds,rb,ncol,l0,unroll,sub,band,sdir[,relax — ignored here]
    parts = [int(v) for v in args.sched.split(",")]
    fb, rounds, rb, n_col = parts[:4]
    l0_tail = bool(parts[4]) if len(parts) > 4 else False
    unroll = parts[5] if len(parts) > 5 else 1
    sub = bool(parts[6]) if len(parts) > 6 else False
    band = int(parts[7]) if len(parts) > 7 else 0
    sdir = int(parts[8]) if len(parts) > 8 else 0

    import dataclasses

    from hmrt_tpu.api.scene import make_scene
    from hmrt_tpu.bench.configs import BENCH_CONFIGS
    from hmrt_tpu.io.heightmap import procedural_terrain
    from hmrt_tpu.kernels import compact as C
    from hmrt_tpu.types import Camera

    w, h = (int(v) for v in args.res.split("x"))
    cfg = dataclasses.replace(BENCH_CONFIGS["B3"].render, width=w, height=h)
    n = args.map
    terr = procedural_terrain(n, seed=3)
    scene = make_scene(terr)
    packed = scene.packed
    zmax = float(terr.max())
    if args.cam == "oblique":
        cam = Camera.create(eye=(n * 0.8, n * 0.2, zmax * 1.6),
                            target=(n * 0.5, n * 0.5, float(terr.mean())),
                            fov_y_deg=45.0)
    else:
        cam = Camera.create(eye=(n * 0.5, -n * 0.25, zmax + n * 0.06),
                            target=(n * 0.5, n * 0.5, float(terr.mean())),
                            fov_y_deg=55.0)

    H, W = cfg.height, cfg.width
    P = -(-H * W // C.LANES) * C.LANES
    valid0 = jnp.arange(P) < H * W
    gmax = scene.pyr_flat[-1]

    def make_rays(salt):
        cs = Camera(eye=cam.eye + salt, target=cam.target, up=cam.up,
                    fov_y=cam.fov_y)
        eye, dirs = cs.rays(H, W)
        d = np.asarray(dirs).reshape(-1, 3)
        d = np.pad(d, ((0, P - d.shape[0]), (0, 0)), constant_values=1.0)
        return (jnp.broadcast_to(eye[0], (P,)),
                jnp.broadcast_to(eye[1], (P,)),
                jnp.broadcast_to(eye[2], (P,)),
                jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]),
                jnp.asarray(d[:, 2]))

    mkw = dict(n=scene.n, m=scene.m, levels=scene.levels, m5=packed.m5,
               l32=packed.l32, cell_intersect=cfg.cell_intersect,
               n_col=n_col, unroll=unroll, subserve=sub, debug=True)

    @functools.partial(jax.jit, static_argnames=("force0",))
    def sort_round(state, rays, res, force0=False):
        if force0:
            state = C._force_level0(rays, state, scene.levels)
        key = (C._band_key(state, packed.m5, scene.m, band) if force0 and band
               else C._column_key(state, packed.m5))
        if sdir:
            rdx, rdy = rays[3], rays[4]
            oc = (((rdy > 0).astype(jnp.int32) << 2)
                  | ((rdx > 0).astype(jnp.int32) << 1)
                  | (jnp.abs(rdy) > jnp.abs(rdx)).astype(jnp.int32))
            ref = (key * 8 + oc if sdir == 1
                   else oc * (C.BIG_KEY >> 3) + key)
            key = jnp.where(key != C.BIG_KEY, ref, C.BIG_KEY)
        perm = jnp.argsort(key)
        rows = C._pack_rows(*rays, *state, *res)
        rows_s = jnp.take(rows, perm, axis=0)
        cols = C._unpack_rows(rows_s, [jnp.float32] * 6
                              + [jnp.int32, jnp.float32, jnp.int32,
                                 jnp.int32, jnp.int32]
                              + [jnp.int32, jnp.float32, jnp.int32,
                                 jnp.int32])
        return tuple(cols[:6]), tuple(cols[6:11]), tuple(cols[11:])

    def report(tag, state, dbg, ms):
        alive = int(np.asarray(state[0]).sum())
        work = np.asarray(dbg[0], np.int64)
        n0 = np.asarray(dbg[1], np.int64)
        nit = np.asarray(dbg[2], np.int64).reshape(-1, C.LANES)[:, 0]
        nskip = np.asarray(dbg[3], np.int64).sum()
        ntest = np.asarray(dbg[4], np.int64).sum()
        nal = np.asarray(dbg[5], np.int64).sum()
        blk_iters = int(nit.sum())
        dens = work.sum() / max(1024 * blk_iters, 1)
        w0 = max(n0.sum(), 1)
        print(f"{tag}: {ms:7.1f} ms  alive_out={alive:8d}  "
              f"lane_steps={work.sum()/1e6:8.1f}M  "
              f"lvl0={100.0*n0.sum()/max(work.sum(),1):5.1f}%  "
              f"skip0={100.0*nskip/w0:5.1f}%  test0={100.0*ntest/w0:5.1f}%  "
              f"blk_iters={blk_iters:8d}  density={100*dens:5.1f}%  "
              f"served/alive={100.0*work.sum()/max(nal,1):5.1f}%  "
              f"alive/block={100.0*nal/max(1024*blk_iters,1):5.1f}%",
              flush=True)

    if args.prefixes:
        # divisor i applies to sorted round i+1 (the first divisor should
        # be 1: alive lanes are in launch order until the first sort);
        # the last listed round is unbudgeted, then a full guard pass
        divs = [int(d) for d in args.prefixes.split(",")]
        sizes = ([P] + [max(1024, ((P // d) // 1024) * 1024)
                        for d in divs] + [P])
        budgets = [fb] + [rb] * (len(divs) - 1) + [1 << 22, 1 << 22]
    else:
        budgets = [fb] + [rb] * (rounds - 1) + [1 << 22]
        sizes = [P] * len(budgets)

    for rep, saltv in enumerate([0.0, 1e-4]):
        rays = make_rays(jnp.asarray([saltv, -saltv, saltv], jnp.float32))
        state = C._init_state(*rays, valid0, gmax, n=scene.n,
                              levels=scene.levels)
        res = (jnp.zeros(P, jnp.int32), jnp.full(P, C.BIG_T, jnp.float32),
               jnp.zeros(P, jnp.int32), jnp.zeros(P, jnp.int32))
        if rep == 1:
            print("--- warm, salted repetition ---", flush=True)
        last_marched = len(budgets) - 1
        for r, budget in enumerate(budgets):
            guard = args.prefixes and r == len(budgets) - 1
            tail = l0_tail and r == last_marched - (1 if args.prefixes
                                                    else 0)
            sz = sizes[r]
            if sz < P:
                rays_r = tuple(a[:sz] for a in rays)
                state_r = tuple(a[:sz] for a in state)
                res_r = tuple(a[:sz] for a in res)
            else:
                rays_r, state_r, res_r = rays, state, res
            if r > 0 and not guard:
                (rays_r, state_r, res_r), ms = timed(
                    sort_round, state_r, rays_r, res_r, force0=tail)
                if rep == 1:
                    print(f"sort {r} ({sz} rows): {ms:7.1f} ms", flush=True)
            (state_r, res_r, dbg), ms = timed(
                C.march_pass, packed.coarse, packed.columns, rays_r,
                state_r, res_r, budget=budget, l0_only=tail,
                band_serve=band if tail else 0, **mkw)
            if sz < P:
                rays = tuple(jnp.concatenate([a, b[sz:]])
                             for a, b in zip(rays_r, rays))
                state = tuple(jnp.concatenate([a, b[sz:]])
                              for a, b in zip(state_r, state))
                res = tuple(jnp.concatenate([a, b[sz:]])
                            for a, b in zip(res_r, res))
            else:
                rays, state, res = rays_r, state_r, res_r
            if rep == 1:
                report(f"{'guard' if guard else 'pass'} {r} "
                       f"({sz} rows, budget {budget})", state_r, dbg, ms)

    hit = int(np.asarray(res[0]).sum())
    print(f"total hits: {hit} / {H*W}")


if __name__ == "__main__":
    main()
