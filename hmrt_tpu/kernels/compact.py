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
  3. PERIODIC COMPACTION: before every round, surviving rays are SORTED
     by their current terrain column (one argsort + row-gather — the
     moving ray planes, state AND accumulated hit results ride a
     (P, 12) f32 row matrix so the permutation is one fast row gather;
     broadcast planes — the shared eye / the shared sun direction —
     stay out), making every block column-coherent again; rounds are
     python-unrolled inside one jit (while/scan around pallas_call
     miscompiled when this was built — tools/repros/) and the last
     round is unbudgeted, so every ray resolves. Because each sort
     compacts alive lanes to the FRONT, rounds can be PREFIX-SLICED
     (round_prefixes): sort+march only a static front slice, with a
     full-population unbudgeted guard round completing any straggler a
     prefix missed — dead-row slicing without the per-round host syncs
     that sank the round-2 host-adaptive variant (2.95 s vs 2.65 s,
     BENCH_NOTES.md);
  4. hits are sorted by hit column once more for the SHADE PASS (corner
     gradients + albedo fetched per column), the shadow march starts
     pre-permuted in that same ordering (its round-0 sort would
     recompute it), and the final color math is plain fused XLA
     elementwise.

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
from hmrt_tpu.kernels.march_body import (BIG_KEY, _multi_gather,
                                         _vreg_gather, band_gathers,
                                         cascade_index, column_of,
                                         corner_scan, fine_gathers,
                                         subserve_gathers, wavefront_step,
                                         wavefront_step_l0,
                                         wavefront_step_l0_relaxed)
from hmrt_tpu.kernels.packing import (COL_ROWS, CORNER_ROW, PackedScene,
                                      cascade_offsets)
from hmrt_tpu.shading import shade as sh
from hmrt_tpu.traversal.intersect import BIG_T, INTERSECTORS, SURFACES
from hmrt_tpu.traversal.march import entry_cell, ray_box_range, ray_inverses
from hmrt_tpu.types import Camera, Frame, Scene

LANES = 1024          # rays per kernel block: one (8,128) register set

#: l0_tail="auto": fraction of surviving rays already at level 0 (after
#: the penultimate sorted round) above which the forced-l0 tail kernel
#: is selected. Measured level-0 fractions: B3 grazing tail ~0.999, B4
#: orbit flythrough well below (survivors still take pyramid skips) —
#: the margin is wide, the exact value is uncritical (both branches are
#: bit-exact; this only trades the ~4% l0 win vs the ~2x orbit loss).
L0_TAIL_AUTO_THRESH = 0.9


# ---------------------------------------------------------------------------
# march-pass kernel over explicit ray state
# ---------------------------------------------------------------------------

def _march_pass_kernel(coarse_ref, columns_hbm,
                       ox_r, oy_r, oz_r, dx_r, dy_r, dz_r,
                       t_r, lvl_r, icx_r, icy_r, alive_r,
                       hit_r, thit_r, hx_r, hy_r,
                       *refs,
                       n: int, m: int, levels: int, m5: int, l32: int,
                       cell_intersect: str,
                       coarse_cap: int, budget: int, inner_cap: int,
                       n_col: int, l0_only: bool = False,
                       subserve: bool = False,
                       band_serve: int = 0,
                       unroll: int = 1, relax: int = 0,
                       banks: int = 1,
                       debug: bool = False, clip=None):
    (alive_o, t_o, lvl_o, icx_o, icy_o,
     hit_o, thit_o, hx_o, hy_o) = refs[:9]
    dbg_refs = refs[9:-2] if debug else ()
    col_scr, sems = refs[-2], refs[-1]
    intersector = INTERSECTORS[cell_intersect]
    world_max = float(n - 1)
    top = levels - 1

    cbuf = coarse_ref[:]
    # global max = the pyramid top, which is the last valid coarse entry
    # (the coarse buffer always packs sides 32..1 = 1365 values)
    gmax = cbuf[1364 >> 7, 1364 & 127]

    def coarse_index(lvl, cy, cx):
        q = lvl - l32
        side = 32 >> q
        coff = ((1024 - (1024 >> (2 * q))) * 4) // 3
        return coff + cy * side + cx

    # RAY BANKS: the kernel carries `banks` independent (8,128) wavefronts
    # and advances ALL of them each loop sub-step, so their dependency
    # chains interleave. One wavefront's step is a single long serial
    # chain (gather -> compare -> select -> next index), which runs
    # LATENCY-bound on the VPU (tools/micro_gather.py: ~490 ns/iter
    # serial vs 65-90 ns throughput; tools/micro_vpu.py pins the ALU
    # analog) — independent banks fill the idle issue slots. Results are
    # bit-exact for any `banks`: each lane's march is deterministic and
    # lane-independent; banking only changes which iteration serves it.
    rayb = []
    sts = []
    for b in range(banks):
        r0 = 8 * b
        ox, oy, oz = (ox_r[r0:r0 + 8, :], oy_r[r0:r0 + 8, :],
                      oz_r[r0:r0 + 8, :])
        dx, dy, dz = (dx_r[r0:r0 + 8, :], dy_r[r0:r0 + 8, :],
                      dz_r[r0:r0 + 8, :])
        inv_x, inv_y = ray_inverses(dx, dy)
        _, t1, _ = ray_box_range(ox, oy, dx, dy, world_max, clip)
        rayb.append((ox, oy, oz, dx, dy, dz, inv_x, inv_y, t1))
        # hit state rides THROUGH passes so resort rounds accumulate
        st = dict(
            t=t_r[r0:r0 + 8, :], lvl=lvl_r[r0:r0 + 8, :],
            icx=icx_r[r0:r0 + 8, :], icy=icy_r[r0:r0 + 8, :],
            alive=alive_r[r0:r0 + 8, :],
            hit=hit_r[r0:r0 + 8, :], t_hit=thit_r[r0:r0 + 8, :],
            hx=hx_r[r0:r0 + 8, :], hy=hy_r[r0:r0 + 8, :],
        )
        if debug:
            shp = st["t"].shape
            # per-lane served-step count, level-0 step count, block
            # iteration count, level-0 skip-advances and exact tests —
            # perf diagnosis planes (lane efficiency = work / iters;
            # skip:test ratio gates pair-skip style optimizations)
            st["work"] = jnp.zeros(shp, jnp.int32)
            st["n0"] = jnp.zeros(shp, jnp.int32)
            st["nit"] = jnp.zeros(shp, jnp.int32)
            st["nskip"] = jnp.zeros(shp, jnp.int32)
            st["ntest"] = jnp.zeros(shp, jnp.int32)
            st["nal"] = jnp.zeros(shp, jnp.int32)   # alive-lane integral:
            # work/nal = in-set serving efficiency; nal/(1024*nit) =
            # block liveness — splits density loss into its two causes
        if relax and l0_only:
            # relaxed-tail mode planes (kernel-local: the whole relaxed
            # phase runs inside the one unbudgeted tail pass, so they
            # never cross a pass boundary; a budget exit would restart
            # lanes in stride mode at their current t, which
            # wavefront_step_l0_relaxed handles by integer progress)
            st["rmode"] = jnp.zeros_like(st["icx"])
            st["tprev"] = st["t"]
            st["wend"] = jnp.full(st["t"].shape, BIG_T, jnp.float32)
        sts.append(st)

    def l0_step(st, act, corners_fn, b):
        ox, oy, oz, dx, dy, dz, inv_x, inv_y, t1 = rayb[b]
        if relax:
            return wavefront_step_l0_relaxed(
                st, act, ox, oy, oz, dx, dy, dz, inv_x, inv_y, t1, gmax,
                corners_fn, m=m, intersector=intersector,
                surface=SURFACES[cell_intersect], stride=relax)
        return wavefront_step_l0(
            st, act, ox, oy, oz, dx, dy, dz, inv_x, inv_y, t1, gmax,
            corners_fn, m=m, intersector=intersector)

    # -------- phase A: coarse levels (VMEM), uncapped by the budget --------
    def a_cond(c):
        i, sts = c
        p = None
        for st in sts:
            pb = jnp.any((st["alive"] != 0) & (st["lvl"] >= l32))
            p = pb if p is None else (p | pb)
        return (i < coarse_cap) & p

    def a_step(st, b):
        ox, oy, oz, dx, dy, dz, inv_x, inv_y, t1 = rayb[b]
        act = (st["alive"] != 0) & (st["lvl"] >= l32)
        if debug:
            # phase-A activity rides the same planes; one_step's level-0
            # counter (n0) never fires here, so lvl0% isolates phase B
            st = dict(st, work=st["work"] + act.astype(jnp.int32),
                      nit=st["nit"] + 1)
        lvl, icx, icy = st["lvl"], st["icx"], st["icy"]
        side = m >> lvl
        cidx = coarse_index(lvl, jnp.clip(icy, 0, side - 1),
                            jnp.clip(icx, 0, side - 1))
        cmax = _vreg_gather(cbuf, cidx, 11)
        return wavefront_step(st, act, ox, oy, oz, dx, dy, dz,
                              inv_x, inv_y, t1, gmax, cmax,
                              m=m, asc_cap=3, lvl_ceiling=top)

    def a_body(c):
        i, sts = c
        for _ in range(unroll):  # sync-amortizing unroll (see i_body)
            sts = [a_step(sts[b], b) for b in range(banks)]
        return i + unroll, sts

    if not l0_only:
        _, sts = jax.lax.while_loop(a_cond, a_body, (jnp.int32(0), sts))

    # -------- phase B: column demand loop with iteration budget --------
    n_recs = ((32 // band_serve) * m5 * m5 if band_serve
              else m5 * m5)

    def key_of(st):
        if band_serve:
            # band-granular serving key: the 32 x band_serve-cell band b
            # of column c is record (32//band_serve)*c + b (gather:
            # march_body.band_gathers)
            q = 32 // band_serve
            sh = band_serve.bit_length() - 1
            band = (jnp.clip(st["icy"], 0, m - 1) & 31) >> sh
            return jnp.where(st["alive"] != 0,
                             column_of(st, m5) * q + band, BIG_KEY)
        return column_of(st, m5)

    offs = cascade_offsets(l32)
    # subserve: the sublane index plane — each of the block's 8 sublane
    # rows is served by ITS OWN column record (see march_body
    # subserve_gathers for why this is nearly free on Mosaic)
    subl = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            if subserve else None)
    # subserve: n_col = records (serving banks) per sublane; slot order in
    # the scratch middle dim is [8*v + s for serving bank v, sublane s],
    # and ray bank b owns middle-dim slots [b*n_serve, (b+1)*n_serve)
    n_serve = 8 * n_col if subserve else n_col

    # NOTE a software-pipelined double-buffered variant (prefetch the
    # predicted next record set into a second scratch half while marching
    # the current one) measured 2745 ms vs 2587 ms serial on B3: the
    # mispredicted sets lose more lane density than the ~us of DMA
    # latency they hide. Serial start->wait->march stays.
    def select_excl(keys, excl):
        rest = keys
        for e in excl:
            rest = jnp.where(rest == e, BIG_KEY, rest)
        sels = []
        for _ in range(n_col):
            sc = jnp.min(rest)
            sels.append(sc)
            rest = jnp.where(rest == sc, BIG_KEY, rest)
        return sels

    def select_sub(keys):
        # per-sublane n_col min keys: 8 independent demand streams, each
        # serving its n_col lowest-key records (bank-major list)
        sels = []
        rest = keys
        for _ in range(n_col):
            bank = [jnp.min(jnp.where(subl == s, rest, BIG_KEY))
                    for s in range(8)]
            sels.extend(bank)
            for s, sc in enumerate(bank):
                rest = jnp.where((subl == s) & (rest == sc), BIG_KEY, rest)
        return sels

    def start_dmas(sels, base):
        # base = this ray bank's absolute slot offset (b * n_serve)
        for c, sc in enumerate(sels):
            scc = jnp.minimum(sc, n_recs - 1)
            if band_serve:
                # one contiguous (band_rows, 128) copy: the corner rows
                # of band scc%q inside column record scc//q (band-major
                # layout, kernels/packing.py)
                q = 32 // band_serve
                qs = q.bit_length() - 1
                src = columns_hbm.at[
                    scc >> qs,
                    pl.ds(CORNER_ROW + band_serve * (scc & (q - 1)),
                          band_serve)]
            else:
                src = columns_hbm.at[scc]
            dst = (col_scr.at[:, base + c, :] if subserve
                   else col_scr.at[base + c])
            pltpu.make_async_copy(src, dst, sems.at[base + c]).start()

    def wait_dmas(total):
        for c in range(total):
            src = (columns_hbm.at[0, pl.ds(0, band_serve)] if band_serve
                   else columns_hbm.at[0])
            dst = (col_scr.at[:, c, :] if subserve
                   else col_scr.at[c])
            pltpu.make_async_copy(src, dst, sems.at[c]).wait()

    def b_cond(c):
        nin, sts = c
        p = None
        for st in sts:
            pb = jnp.any(st["alive"] != 0)
            p = pb if p is None else (p | pb)
        return (nin < budget) & p

    def march_set_all(sts, sels_list):
        # sels_list[b]: ray bank b's serving keys — n_col (8,128) planes
        # (sublane s's keys broadcast over its lanes) under subserve,
        # otherwise the n_col scalar keys.

        def in_set(st, sels):
            cols = key_of(st)
            ok = cols == sels[0]
            for sc in sels[1:]:
                ok = ok | (cols == sc)
            return ok

        def i_cond(cc):
            k, sts = cc
            p = None
            for b in range(banks):
                pb = jnp.any((sts[b]["alive"] != 0)
                             & in_set(sts[b], sels_list[b]))
                p = pb if p is None else (p | pb)
            return (k < inner_cap) & p

        def one_step(st, b):
            sels = sels_list[b]
            base = b * n_serve
            ox, oy, oz, dx, dy, dz, inv_x, inv_y, t1 = rayb[b]
            act = (st["alive"] != 0) & in_set(st, sels)
            lvl, icx, icy = st["lvl"], st["icx"], st["icy"]
            if debug:
                st = dict(st, work=st["work"] + act.astype(jnp.int32),
                          n0=st["n0"] + (act & (lvl == 0)).astype(jnp.int32),
                          nit=st["nit"] + 1,
                          nal=st["nal"] + (st["alive"] != 0).astype(jnp.int32))
            f0 = (icy & 31) * 32 + (icx & 31)
            cols_now = key_of(st)
            if subserve:
                bank_masks = [None] + [cols_now == sv for sv in sels[1:]]
                if band_serve:
                    corners_fn = band_gathers(col_scr, bank_masks, f0,
                                              band_rows=band_serve,
                                              base=base)
                    return l0_step(st, act, corners_fn, b)
                fidx = (jnp.zeros_like(f0) if l0_only
                        else cascade_index(lvl, icx, icy, l32, offs))
                cmax, corners_fn = subserve_gathers(col_scr, bank_masks,
                                                    lvl, fidx, f0,
                                                    l32, CORNER_ROW,
                                                    base=base)
                if l0_only:
                    st = l0_step(st, act, corners_fn, b)
                else:
                    st = wavefront_step(
                        st, act, ox, oy, oz, dx, dy, dz, inv_x, inv_y, t1,
                        gmax, cmax, corners_fn, m=m, asc_cap=3,
                        lvl_ceiling=l32 - 1, intersector=intersector)
                return st
            if l0_only:
                # tail pass: every lane was force-descended to level 0
                # (tools/diag_b3.py: tail work is 99.9% level 0 at a
                # 0.0-0.4% skip rate — pure DDA + exact test), so the
                # cascade gather, descend, ascent and level arithmetic
                # are compiled out entirely.
                def corners_fn():
                    z = [jnp.zeros(act.shape, jnp.float32)
                         for _ in range(4)]
                    for c, sc in enumerate(sels):
                        mine = cols_now == sc
                        g = corner_scan(col_scr[base + c], f0, CORNER_ROW)
                        z = [jnp.where(mine, g[i], z[i]) for i in range(4)]
                    return tuple(z)

                st = l0_step(st, act, corners_fn, b)
            else:
                at0 = lvl == 0
                fidx = cascade_index(lvl, icx, icy, l32, offs)
                cmax, corners_fn = fine_gathers(col_scr, sels, cols_now,
                                                act, at0, lvl, fidx, f0,
                                                l32, CORNER_ROW, base=base)
                st = wavefront_step(
                    st, act, ox, oy, oz, dx, dy, dz, inv_x, inv_y, t1,
                    gmax, cmax, corners_fn, m=m, asc_cap=3,
                    lvl_ceiling=l32 - 1, intersector=intersector)
            return st

        def i_body(cc):
            # UNROLL: the measured inner loop runs at ~0.8-0.96 us per
            # iteration while issuing only ~660 vector ops — 3-6x below
            # VPU issue capacity, i.e. it is bound by the per-iteration
            # loop sync (cross-lane any() reduction -> scalar -> branch)
            # and serial dependency chains, not by op count. Running
            # several masked steps per condition check amortizes the sync;
            # overshoot costs at most unroll-1 fully-masked steps per set
            # drain (act is recomputed every sub-step, so masking stays
            # exact and results bit-identical). With banks > 1 each
            # sub-step advances every bank, interleaving their chains.
            k, sts = cc
            for _ in range(unroll):
                sts = [one_step(sts[b], b) for b in range(banks)]
            return k + unroll, sts

        k, sts = jax.lax.while_loop(i_cond, i_body, (jnp.int32(0), sts))
        return k, sts

    def b_body(c):
        nin, sts = c
        sels_list = []
        for b in range(banks):
            if subserve:
                sels = select_sub(key_of(sts[b]))
                start_dmas(sels, b * n_serve)
                vecs = []
                for v in range(n_col):
                    sv = jnp.full((8, 128), BIG_KEY, jnp.int32)
                    for s in range(8):
                        sv = jnp.where(subl == s, sels[8 * v + s], sv)
                    vecs.append(sv)
                sels_list.append(vecs)
            else:
                sels = select_excl(key_of(sts[b]), [])
                start_dmas(sels, b * n_serve)
                sels_list.append(sels)
        wait_dmas(banks * n_serve)
        k, sts = march_set_all(sts, sels_list)
        return nin + k, sts

    out = jax.lax.while_loop(b_cond, b_body, (jnp.int32(0), sts))
    sts = out[1]

    for b in range(banks):
        r0 = 8 * b
        st = sts[b]
        alive_o[r0:r0 + 8, :] = st["alive"]
        t_o[r0:r0 + 8, :] = st["t"]
        lvl_o[r0:r0 + 8, :] = st["lvl"]
        icx_o[r0:r0 + 8, :] = st["icx"]
        icy_o[r0:r0 + 8, :] = st["icy"]
        hit_o[r0:r0 + 8, :] = st["hit"]
        thit_o[r0:r0 + 8, :] = st["t_hit"]
        hx_o[r0:r0 + 8, :] = st["hx"]
        hy_o[r0:r0 + 8, :] = st["hy"]
        if debug:
            dbg_refs[0][r0:r0 + 8, :] = st["work"]
            dbg_refs[1][r0:r0 + 8, :] = st["n0"]
            dbg_refs[2][r0:r0 + 8, :] = st["nit"]
            dbg_refs[3][r0:r0 + 8, :] = st["nskip"]
            dbg_refs[4][r0:r0 + 8, :] = st["ntest"]
            dbg_refs[5][r0:r0 + 8, :] = st["nal"]


def _plane_specs(k, rows=8):
    return [pl.BlockSpec((rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM) for _ in range(k)]


@functools.partial(jax.jit,
                   static_argnames=("n", "m", "levels", "m5", "l32",
                                    "cell_intersect", "budget", "n_col",
                                    "l0_only", "subserve",
                                    "band_serve", "unroll", "relax",
                                    "banks", "coarse_cap",
                                    "interpret", "debug", "clip"))
def march_pass(coarse, columns, rays, state, results, *, n, m, levels, m5,
               l32, cell_intersect, budget, n_col=2, l0_only=False,
               subserve=False, band_serve=0, unroll=1, relax=0, banks=1,
               coarse_cap=None,
               interpret=False, debug=False, clip=None):
    """One budgeted march sweep over all ray blocks.

    rays:    (ox, oy, oz, dx, dy, dz) planes, each f32[P] with P % 1024 == 0
    state:   (alive_i32, t, lvl, icx, icy) planes
    results: (hit_i32, t_hit, hx, hy) planes, carried THROUGH the pass so
             resort rounds accumulate hits across passes
    subserve: serve n_col column records per SUBLANE (8 independent
             demand streams per block) — the scratch is laid out
             transposed, (rows, 8*n_col, 128), so a record's rows land
             in its sublane's slot of each row slice and one take-scan
             per bank serves 8 records (march_body.subserve_gathers).
    band_serve (implies l0_only + subserve): serving keys are 32 x
             band_serve-cell BANDS (column*(32//band_serve) + band) and
             each bank DMA is the band's band_serve contiguous corner
             rows — the corner gather is band_serve//4 chunked takes per
             channel (march_body.band_gathers). band_serve=32 is the
             whole-column key with a corner-rows-only (32-row) DMA.
    banks:   independent (8,128) ray wavefronts carried per kernel
             instance, all advanced each loop sub-step so their serial
             dependency chains interleave on the VPU (see the kernel's
             RAY BANKS note). Requires P % (1024*banks) == 0. Bit-exact
             for any value.
    Returns (new_state, new_results).
    """
    assert not (band_serve and not (l0_only and subserve))
    # 32 = whole-column key but the DMA copies ONLY the 32 corner rows
    # (the l0 tail never reads the cascade rows of the 36-row record)
    assert band_serve in (0, 4, 8, 16, 32), band_serve
    assert not (relax and not l0_only), "relax is a level-0 tail mode"
    # unroll advances the while_loop counters by `unroll` per body; 0
    # would spin forever (ADVICE r4 #2 — stale sweep grammars hit this)
    assert unroll >= 1, unroll
    assert banks >= 1, banks
    P = rays[0].shape[0]
    R = P // 128
    BR = 8 * banks
    assert R % BR == 0, (P, banks)
    planes = [r.reshape(R, 128) for r in rays] \
        + [state[1].reshape(R, 128), state[2].reshape(R, 128),
           state[3].reshape(R, 128), state[4].reshape(R, 128),
           state[0].reshape(R, 128)] \
        + [r.reshape(R, 128) for r in results]
    grid = (R // BR,)

    kern = functools.partial(
        _march_pass_kernel, n=n, m=m, levels=levels, m5=m5, l32=l32,
        cell_intersect=cell_intersect,
        # coarse_cap=None -> uncapped (a bound the descent never hits);
        # a small cap = SHALLOW pass-0 descent, the rest of phase A runs
        # in the next round's kernel on sorted blocks (pass-0 fold
        # experiment, VERDICT r4 next #5)
        coarse_cap=(24 * levels + 96 if coarse_cap is None
                    else int(coarse_cap)),
        budget=budget, inner_cap=256,
        n_col=n_col, l0_only=l0_only,
        subserve=subserve, band_serve=band_serve,
        unroll=unroll, relax=relax, banks=banks,
        debug=debug, clip=clip)

    out_dt = ([jnp.int32, jnp.float32, jnp.int32, jnp.int32, jnp.int32]
              + [jnp.int32, jnp.float32, jnp.int32, jnp.int32]
              + ([jnp.int32] * 6 if debug else []))
    rec_rows = band_serve if band_serve else COL_ROWS
    n_serve = 8 * n_col if subserve else n_col
    scr_shape = ((rec_rows, n_serve * banks, 128) if subserve
                 else (n_col * banks, rec_rows, 128))
    n_sems = max(n_serve * banks, 2)
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=([pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pl.ANY)]
                  + _plane_specs(15, rows=BR)),
        out_specs=_plane_specs(len(out_dt), rows=BR),
        out_shape=[jax.ShapeDtypeStruct((R, 128), dt) for dt in out_dt],
        scratch_shapes=[
            pltpu.VMEM(scr_shape, jnp.float32),
            pltpu.SemaphoreType.DMA((n_sems,)),
        ],
        interpret=interpret,
    )(coarse, columns, *planes)
    flat = [o.reshape(P) for o in outs]
    new_state = (flat[0], flat[1], flat[2], flat[3], flat[4])
    new_results = (flat[5], flat[6], flat[7], flat[8])
    if debug:
        return new_state, new_results, tuple(flat[9:15])
    return new_state, new_results


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
        gs = _multi_gather(tuple(shade_scr[c] for c in range(8)), f0)
        gx = bilerp(gs[0], gs[1], gs[2], gs[3])
        gy = bilerp(gs[4], gs[5], gs[6], gs[7])
        inv = jax.lax.rsqrt(gx * gx + gy * gy + 1.0)
        nx = jnp.where(mine, -gx * inv, nx)
        ny = jnp.where(mine, -gy * inv, ny)
        nz = jnp.where(mine, inv, nz)
        if textured:
            ga = _multi_gather(tuple(albedo_scr[c] for c in range(12)), f0)
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

def _init_state(ox, oy, oz, dx, dy, dz, valid0, gmax, *, n, levels,
                clip=None, m=None, start_cell=None):
    """Initial march state — identical math to the kernels' entry logic.

    `start_cell=(cx, cy)`: begin at level 0 in that fine cell instead of
    descending from the pyramid top — the shadow-ray variant (origins sit
    in the primary hit cell; starting at any level is correct, this skips
    the whole coarse phase — same policy as the fused kernel)."""
    world_max = float(n - 1)
    t0, t1, valid = ray_box_range(ox, oy, dx, dy, world_max, clip)
    valid = valid & valid0
    sky = ((oz + t0 * dz) > gmax) & (dz >= 0.0)
    valid = valid & ~sky
    if start_cell is not None:
        lvl = jnp.zeros(ox.shape, jnp.int32)
        icx = jnp.clip(start_cell[0], 0, m - 1)
        icy = jnp.clip(start_cell[1], 0, m - 1)
    else:
        top = levels - 1
        lvl = jnp.full(ox.shape, top, jnp.int32)
        icx, icy = entry_cell(ox, oy, dx, dy, t0, lvl, 1)
    return (valid.astype(jnp.int32), jnp.where(valid, t0, BIG_T),
            lvl, icx, icy)


def _force_level0(rays, state, levels):
    """Descend every surviving lane to the level-0 cell containing its
    current position. Descending without testing is always safe (the skip
    test only ever skips when certain, and this skips nothing), so the
    l0-only tail pass stays bit-exact; the cost is that a lane that could
    still have taken coarse skips now steps cell-by-cell — measured
    irrelevant, the tail is 99.9% level-0 anyway (tools/diag_b3.py)."""
    from hmrt_tpu.traversal.march import descend_cell
    ox, oy, oz, dx, dy, dz = rays
    alive, t, lvl, icx, icy = state
    for _ in range(levels - 1):
        can = lvl > 0
        dcx, dcy = descend_cell(ox, oy, dx, dy, t, icx, icy,
                                jnp.maximum(lvl, 1))
        icx = jnp.where(can, dcx, icx)
        icy = jnp.where(can, dcy, icy)
        lvl = jnp.maximum(lvl - 1, 0)
    return (alive, t, lvl, icx, icy)


def _column_key(state, m5):
    alive, t, lvl, icx, icy = state
    colx = jnp.clip((icx << lvl) >> 5, 0, m5 - 1)
    coly = jnp.clip((icy << lvl) >> 5, 0, m5 - 1)
    return jnp.where(alive != 0, coly * m5 + colx, BIG_KEY)


def _band_key(state, m5, m, bh=4):
    """column*(32//bh) + band serving key of the band-granular tail — the
    same expression as the kernel's key_of in band mode (level-0 state)."""
    alive, _, _, icx, icy = state
    icyc = jnp.clip(icy, 0, m - 1)
    colx = jnp.clip(icx >> 5, 0, m5 - 1)
    coly = jnp.clip(icyc >> 5, 0, m5 - 1)
    sh = bh.bit_length() - 1
    return jnp.where(alive != 0,
                     (coly * m5 + colx) * (32 >> sh)
                     + ((icyc & 31) >> sh), BIG_KEY)


#: Pack i32 state planes into the f32 sort-row matrix by BITCAST instead
#: of value conversion. Bitcast would be cheaper (no convert ops on 15
#: planes x 2.07M rays per sort round) and is exact for any i32, BUT it
#: STILL miscompiles on real TPU hardware on jax 0.9.0 when fused into
#: the full render program: the isolated repro
#: (tools/repros/bitcast_argsort.py) passes, yet with True here the five
#: hardware compact-vs-oracle tests all fail (hit mismatches; interpret
#: mode and CPU pass — re-measured 2026-08-17, see BENCH_NOTES platform
#: hazards). Keep False until a jax upgrade makes the full-scale run
#: pass; the value conversion is equally exact (march integers < 2^24).
BITCAST_PACK = False


def _pack_rows(*planes):
    """Stack f32/i32 planes into a (P, C) f32 row matrix (see
    BITCAST_PACK; with it off, integer planes are VALUE-converted — all
    march integers are far below 2^24 so the f32 round-trip is exact)."""
    if BITCAST_PACK:
        return jnp.stack(
            [p if p.dtype == jnp.float32
             else jax.lax.bitcast_convert_type(p.astype(jnp.int32),
                                               jnp.float32)
             for p in planes], axis=1)
    return jnp.stack([p.astype(jnp.float32) for p in planes], axis=1)


def _unpack_rows(rows, dtypes):
    if BITCAST_PACK:
        return [rows[:, i] if dt == jnp.float32
                else jax.lax.bitcast_convert_type(rows[:, i], jnp.int32)
                for i, dt in enumerate(dtypes)]
    return [rows[:, i].astype(dt) for i, dt in enumerate(dtypes)]


@functools.partial(jax.jit,
                   static_argnames=("config", "n", "m", "levels", "m5",
                                    "l32", "interpret", "first_budget",
                                    "rounds", "round_budget", "n_col",
                                    "l0_tail", "subserve",
                                    "band_tail",
                                    "unroll", "full_height",
                                    "prefixes", "shadow_prefixes",
                                    "sort_dir", "relax", "banks",
                                    "coarse0", "sort_mode", "fold_inv"))
def _render_compact_jit(camera, light, coarse, columns, shade_b,
                        albedo_b, gmax, *, config: RenderConfig, n, m,
                        levels, m5, l32, interpret, first_budget=96,
                        rounds=3, round_budget=256, n_col=2, l0_tail=False,
                        subserve=False, band_tail=False,
                        unroll=1, row0=None, full_height=None,
                        prefixes=None, shadow_prefixes=None,
                        sort_dir=0, relax=0, banks=1, coarse0=None,
                        sort_mode=0, fold_inv=True):
    H, W = config.height, config.width
    LB = LANES * banks   # kernel block granularity (see march_pass banks)
    P = -(-H * W // LB) * LB

    eye, dirs = camera.rays(H, W, row0=row0, full_height=full_height)
    d = dirs.reshape(-1, 3)
    pad = P - d.shape[0]
    d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    valid0 = jnp.arange(P) < H * W
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    ox = jnp.broadcast_to(eye[0], (P,))
    oy = jnp.broadcast_to(eye[1], (P,))
    oz = jnp.broadcast_to(eye[2], (P,))
    rays = (ox, oy, oz, dx, dy, dz)

    # n_col may be per-round: (pass0, round1, ..., final); an int applies
    # to every pass. Early passes span many columns per block; post-sort
    # tail blocks are column-tight, where fewer served columns cut the
    # dominant per-column gather cost.
    ncols = ((n_col,) * (rounds + 1) if isinstance(n_col, int)
             else tuple(n_col))
    assert len(ncols) == rounds + 1, (ncols, rounds)
    # round_budget may be per-round: rbs[r] budgets sorted round r (the
    # last sorted round is always unbudgeted)
    rbs = ((round_budget,) * max(rounds, 1)
           if isinstance(round_budget, int) else tuple(round_budget))
    mkw = dict(n=n, m=m, levels=levels, m5=m5, l32=l32,
               cell_intersect=config.cell_intersect,
               unroll=unroll, banks=banks, interpret=interpret,
               clip=config.clip_box)
    state_dts = [jnp.int32, jnp.float32, jnp.int32, jnp.int32, jnp.int32]
    res_dts = [jnp.int32, jnp.float32, jnp.int32, jnp.int32]

    def full_march(rays, state, skip_pass0=False, rounds_n=None,
                   prefixes_n=None, sort_ray_planes=(0, 1, 2, 3, 4, 5),
                   perm0=None, return_sorted=False):
        """Budgeted march passes with PERIODIC COMPACTION (BASELINE.json:5):
        before every round survivors are argsort'ed by their current
        terrain column — state+results ride in a (P, 15) f32 row matrix so
        the permutation is one fast row gather — which makes each (8,128)
        ray block column-coherent, so the demand loop serves (nearly) all
        of a block's lanes from the n_col records it DMAs. Rounds are
        python-unrolled: wrapping pallas_call in lax.while_loop/scan
        miscompiled on real hardware (BENCH_NOTES.md platform hazards).
        The last round is effectively unbudgeted, guaranteeing completion
        (the march makes integer progress every iteration).

        skip_pass0/rounds_n: the shadow march starts at level 0 in the
        primary hit cell, so the screen-order pass (coarse phase +
        budget-0 demand loop) would be a no-op sweep over every block —
        skip it; and shadows converge in ~1 sorted round (BENCH_NOTES),
        so fewer rounds skip an argsort too.

        prefixes_n: PREFIX-SLICED rounds — every sort compacts alive
        lanes to the front of the row matrix (dead lanes key BIG_KEY), so
        once the population has shrunk, round r can sort AND march only
        the first prefixes_n[r] rows: the argsort cost scales down with
        the survivor count and the marched blocks stay dense instead of
        sweeping ever-deader blocks. Slicing is a pure perf policy, NOT a
        correctness assumption: an alive lane outside a round's prefix
        simply does not march that round, and a final GUARD round
        (appended whenever prefixes_n is set: full population, no sort,
        unbudgeted) completes any such straggler — when none exist it
        costs only the near-empty block sweep (~ms). Round 0 always
        sorts/marches the full population (alive lanes are still in
        launch order before the first sort)."""
        n_rounds = rounds if rounds_n is None else rounds_n
        P = rays[0].shape[0]
        res = (jnp.zeros(P, jnp.int32), jnp.full(P, BIG_T, jnp.float32),
               jnp.zeros(P, jnp.int32), jnp.zeros(P, jnp.int32))
        # pass 0: screen/launch order, small budget (sky + near hits
        # resolve; survivors carry their column position into the sort).
        # coarse0 (pass-0 fold experiment, VERDICT r4 next #5): a small
        # int caps pass 0's coarse descent — a SHALLOW sweep whose
        # positions still make decent round-0 sort keys (column_of
        # quantizes by 2^lvl), the remaining descent running inside
        # round 1's phase A on sorted blocks; 0 skips pass 0 entirely
        # and round 0 sorts by the ray's LEVEL-0 ENTRY column instead
        # (sorted_round below). Both are pure schedule policy — exact.
        if not skip_pass0 and coarse0 != 0:
            state, res = march_pass(coarse, columns, rays, state, res,
                                    budget=first_budget, n_col=ncols[0],
                                    subserve=subserve, coarse_cap=coarse0,
                                    **mkw)
        perm_tot = perm0
        if prefixes_n is not None:
            assert len(prefixes_n) == n_rounds, (prefixes_n, n_rounds)
            # multiples of the kernel block size; round 0 is always full
            prefs = [P] + [max(LB, min(-(-p // LB) * LB, P))
                           for p in prefixes_n[1:]]
        else:
            prefs = [P] * n_rounds
        for r in range(n_rounds):
            last = r == n_rounds - 1
            sz = prefs[r]
            if sz < P:
                rays_r = tuple(a[:sz] for a in rays)
                state_r = tuple(a[:sz] for a in state)
                res_r = tuple(a[:sz] for a in res)
            else:
                rays_r, state_r, res_r = rays, state, res

            # perm0: the caller already ordered the lanes (the shadow
            # march reuses the shade pass's hit-column sort, which is
            # exactly round 0's key) — skip round 0's own sort
            do_sort = not (perm0 is not None and r == 0)

            def sorted_round(args, tail, last=last, r=r):
                """One sort + march round; `tail` selects the forced-l0
                serving variant (static — compiles its own kernel)."""
                rays, state, res = args
                if tail:
                    # force level 0 BEFORE the sort so the sort key is
                    # the final-pass serving key (band / column)
                    state = _force_level0(rays, state, levels)
                if not do_sort:
                    return march_round(rays, state, res, tail) + (None,)
                if r == 0 and coarse0 == 0 and not skip_pass0:
                    # pass 0 was skipped: lanes still sit at the pyramid
                    # top, where _column_key quantizes every ray to one
                    # key. Sort by the LEVEL-0 ENTRY column instead (the
                    # cell where the ray crosses into the map — cheap
                    # elementwise XLA); round 1's phase A then runs the
                    # whole coarse descent on entry-coherent blocks.
                    ex, ey = entry_cell(rays[0], rays[1], rays[3], rays[4],
                                        state[1], jnp.int32(0), m)
                    key = jnp.where(state[0] != 0,
                                    (ey >> 5) * m5 + (ex >> 5), BIG_KEY)
                else:
                    key = (_band_key(state, m5, m, band_tail)
                           if tail and band_tail
                           else _column_key(state, m5))
                if sort_dir:
                    # direction-aware grouping: rays of one column that
                    # march the same way exit to the same neighbor, so
                    # blocks stay record-coherent BETWEEN resorts (the
                    # served/alive density loss, BENCH_NOTES diag). The
                    # key is only a permutation choice — any value is
                    # exact. sort_dir=1: octant subordinate to column;
                    # sort_dir=2: octant-major (same-heading blocks).
                    rdx, rdy = rays[3], rays[4]
                    oc = (((rdy > 0).astype(jnp.int32) << 2)
                          | ((rdx > 0).astype(jnp.int32) << 1)
                          | (jnp.abs(rdy) > jnp.abs(rdx)).astype(jnp.int32))
                    ref = (key * 8 + oc if sort_dir == 1
                           else oc * (BIG_KEY >> 3) + key)
                    key = jnp.where(key != BIG_KEY, ref, BIG_KEY)
                # broadcast ray planes are permutation-invariant and stay
                # out of the sorted row matrix: primary rays share one
                # origin (eye), shadow rays one direction (sun) — 12
                # gathered planes instead of 15 per resort round
                mov = tuple(rays[i] for i in sort_ray_planes)
                nr = len(mov)
                if sort_mode in (1, 2):
                    # PAYLOAD SORT (VERDICT r4 next #2, micro_sort row
                    # `sort_payload`): one lax.sort carries the 12 state/
                    # result planes through the sort network alongside an
                    # iota perm plane — replaces argsort + f32 row-matrix
                    # pack + (P,12) row-gather + unpack, and i32 planes
                    # ride natively (no value converts at all). The
                    # permutation is identical policy (any order of equal
                    # keys is exact); perm still feeds perm_tot inversion.
                    iota = jnp.arange(key.shape[0], dtype=jnp.int32)
                    out = jax.lax.sort((key, iota) + mov + state + res,
                                       num_keys=1, is_stable=False)
                    perm = out[1]
                    cols = list(out[2:])
                elif sort_mode == 4:
                    # SLIM FUSED row gather (round 5, second half): the
                    # TPU gather pays a large per-invocation cost and a
                    # small per-column cost (micro_sort: plane_gather ~
                    # half of row_gather(P,12)), so (a) planes whose
                    # values are live in DISJOINT lane states share one
                    # column — hx/hy == icx/icy at hit by construction
                    # (march_body writes hx from the current cell and
                    # dead lanes never advance), t_hit overwrites the
                    # dead march t, and alive/lvl/hit are 7 bits — and
                    # (b) the perm_tot composition rides as a pid column
                    # instead of paying its own full jnp.take per round.
                    # 13 gathered planes (12 + separate pid) become 8.
                    # Every merged value is exact: the shadowed slots are
                    # either masked (dead-lane state never affects
                    # results — serving keys are alive-masked) or
                    # restored bit-identically by the unpack selects.
                    perm = jnp.argsort(key)
                    pid = (perm_tot[:sz] if perm_tot is not None
                           else jnp.arange(key.shape[0], dtype=jnp.int32))
                    hitb = res[0] != 0
                    c1 = state[0] + (state[2] << 1) + (res[0] << 6)
                    tm = jnp.where(hitb, res[1], state[1])
                    cx = jnp.where(hitb, res[2], state[3])
                    cy = jnp.where(hitb, res[3], state[4])
                    rows = _pack_rows(pid, *mov, c1, tm, cx, cy)
                    rows_s = jnp.take(rows, perm, axis=0)
                    cols = _unpack_rows(
                        rows_s, [jnp.int32] + [jnp.float32] * nr
                        + [jnp.int32, jnp.float32, jnp.int32, jnp.int32])
                    perm = cols[0]  # the composed pid, not the raw perm
                    c1s, tms, cxs, cys = cols[nr + 1:]
                    alv = c1s & 1
                    lvs = (c1s >> 1) & 31
                    hts = c1s >> 6
                    hb = hts != 0
                    cols = (cols[1:nr + 1]
                            + [alv, tms, lvs, cxs, cys]
                            + [hts, jnp.where(hb, tms, BIG_T),
                               jnp.where(hb, cxs, 0),
                               jnp.where(hb, cys, 0)])
                else:
                    perm = jnp.argsort(key)
                    rows = _pack_rows(*mov, *state, *res)
                    rows_s = jnp.take(rows, perm, axis=0)
                    cols = _unpack_rows(rows_s,
                                        [jnp.float32] * len(mov) + state_dts
                                        + res_dts)
                it = iter(cols[:nr])
                rays = tuple(next(it) if i in sort_ray_planes else rays[i]
                             for i in range(6))
                state = tuple(cols[nr:nr + 5])
                res = tuple(cols[nr + 5:])
                return march_round(rays, state, res, tail) + (perm,)

            def march_round(rays, state, res, tail, last=last, r=r):
                state, res = march_pass(coarse, columns,
                                        rays, state, res,
                                        budget=(1 << 22) if last
                                        else rbs[min(r, len(rbs) - 1)],
                                        n_col=ncols[-1] if last
                                        else ncols[min(r + 1,
                                                       len(ncols) - 1)],
                                        l0_only=tail,
                                        subserve=subserve,
                                        band_serve=(band_tail
                                                    if tail and subserve
                                                    else 0),
                                        relax=relax if tail else 0,
                                        **mkw)
                return rays, state, res

            if last and l0_tail == "auto":
                # ADAPTIVE tail: the forced-l0 kernel (cascade logic
                # compiled out) wins ~4% when survivors are grazing-
                # bound (B3: 99.9% of tail work at level 0) but costs
                # ~2x when they still take pyramid skips (B4 orbit
                # views, BENCH_NOTES round-2/3). Decide per frame from
                # the survivors' level mix; both branches are exact, so
                # the threshold is a pure perf knob.
                alive = state_r[0] != 0
                n_alive = jnp.sum(alive.astype(jnp.int32))
                n_l0 = jnp.sum((alive & (state_r[2] == 0)).astype(jnp.int32))
                pred = n_l0 > (L0_TAIL_AUTO_THRESH * n_alive.astype(
                    jnp.float32)).astype(jnp.int32)
                rays_r, state_r, res_r, perm = jax.lax.cond(
                    pred,
                    functools.partial(sorted_round, tail=True),
                    functools.partial(sorted_round, tail=False),
                    (rays_r, state_r, res_r))
            else:
                rays_r, state_r, res_r, perm = sorted_round(
                    (rays_r, state_r, res_r), tail=last and l0_tail is True)
            if sz < P:
                rays = tuple(jnp.concatenate([a, b[sz:]])
                             for a, b in zip(rays_r, rays))
                state = tuple(jnp.concatenate([a, b[sz:]])
                              for a, b in zip(state_r, state))
                res = tuple(jnp.concatenate([a, b[sz:]])
                            for a, b in zip(res_r, res))
            else:
                rays, state, res = rays_r, state_r, res_r
            if perm is not None:
                if sort_mode == 4:
                    # mode 4: `perm` is the already-composed pid column
                    # out of the fused row gather — assign, don't compose
                    if perm_tot is None and sz < P:
                        perm_tot = jnp.arange(
                            P, dtype=jnp.int32).at[:sz].set(perm)
                    elif sz < P:
                        perm_tot = perm_tot.at[:sz].set(perm)
                    else:
                        perm_tot = perm
                    continue
                if perm_tot is None:
                    perm_tot = (jnp.arange(P, dtype=jnp.int32) if sz < P
                                else None)
                if perm_tot is None:
                    perm_tot = perm
                elif sz < P:
                    perm_tot = perm_tot.at[:sz].set(
                        jnp.take(perm_tot[:sz], perm))
                else:
                    perm_tot = jnp.take(perm_tot, perm)
        if prefixes_n is not None:
            # GUARD round: full population, no sort, unbudgeted — marches
            # any alive lane a prefix never covered; near-free when none
            # exist (every block's demand loop exits immediately)
            state, res = march_pass(coarse, columns, rays, state, res,
                                    budget=(1 << 22), n_col=ncols[-1],
                                    subserve=subserve, **mkw)
        if return_sorted:
            # round-final order, plus the composed permutation mapping
            # each final position to its launch pid (None = never
            # sorted, i.e. still launch order) — the caller folds the
            # inversion into its own downstream gather/scatter
            return res, rays, perm_tot
        # back to launch order (invert the composed permutation)
        if perm_tot is not None:
            inv = jnp.zeros(P, jnp.int32).at[perm_tot].set(
                jnp.arange(P, dtype=jnp.int32))
            res_rows = jnp.take(_pack_rows(*res), inv, axis=0)
            res = _unpack_rows(res_rows, res_dts)
        return res[0] != 0, res[1], res[2], res[3]

    state0 = _init_state(ox, oy, oz, dx, dy, dz, valid0, gmax, n=n,
                         levels=levels, clip=config.clip_box)
    # legacy flow: march inverts to launch order internally, shading
    # re-sorts + inverts separately, shadows pre-permute. The payload
    # sort modes require it (their shade sort has no column to ride);
    # fold_inv=False selects it for the other modes as the paired
    # A/B control of the folded-inversion experiment.
    legacy_flow = sort_mode in (1, 3) or not fold_inv
    # ---------------- shading data (sorted by hit column) ----------------
    if legacy_flow:
        # payload-sort experiment path: march results invert to launch
        # order inside full_march, the shade sort carries its planes
        # through the sort network, and the shadow start state is built
        # in launch order then pre-permuted (the historical flow)
        hit, t_hit, hx, hy = full_march(rays, state0, prefixes_n=prefixes,
                                        sort_ray_planes=(3, 4, 5))
        ts = jnp.where(hit, t_hit, 0.0)
        px = ox + ts * dx
        py = oy + ts * dy
        pz = oz + ts * dz
        fx = jnp.clip(px - hx.astype(jnp.float32), 0.0, 1.0)
        fy = jnp.clip(py - hy.astype(jnp.float32), 0.0, 1.0)
        key_h = jnp.where(hit, (hy >> 5) * m5 + (hx >> 5), BIG_KEY)
        out = jax.lax.sort((key_h, jnp.arange(P, dtype=jnp.int32),
                            hit.astype(jnp.int32), hx, hy, fx, fy),
                           num_keys=1, is_stable=False)
        perm_h = out[1]
        hcols = list(out[2:])
        # invert by scatter (an argsort of perm_h costs a full second
        # sort; the scatter is one cheap row write)
        inv_h = jnp.zeros(P, jnp.int32).at[perm_h].set(
            jnp.arange(P, dtype=jnp.int32))
        shaded = shade_pass(shade_b, albedo_b, *hcols, m5=m5,
                            textured=bool(config.texture
                                          and albedo_b is not None),
                            interpret=interpret)
        srows = jnp.take(_pack_rows(*shaded), inv_h, axis=0)
        nx_s, ny_s, nz_s, ar, ag, ab = [srows[:, i] for i in range(6)]
    else:
        # FOLDED-INVERSION flow (round 5): the march returns its results
        # in round-final order together with the composed launch-pid
        # permutation, the shade key/sort run directly on march-order
        # planes (elementwise math commutes with any permutation
        # bit-exactly; argsort equal-key order is pure serving policy),
        # and ONE inversion gather at the end carries everything the
        # launch-order color math consumes. This deletes the march's
        # (P,4) inversion gather + scatter and merges the shading
        # inversion into the same row gather; with shadows on, the hit
        # positions ride the shade gather so the shadow start state is
        # built in hit-sorted order (no pre-permute gather) and the
        # shadow march's inversion collapses to one plane scatter.
        res_m, rays_m, pid_m = full_march(rays, state0,
                                          prefixes_n=prefixes,
                                          sort_ray_planes=(3, 4, 5),
                                          return_sorted=True)
        if pid_m is None:
            pid_m = jnp.arange(P, dtype=jnp.int32)
        hit_m = res_m[0] != 0
        t_hit_m, hx_m, hy_m = res_m[1], res_m[2], res_m[3]
        dx_m, dy_m, dz_m = rays_m[3], rays_m[4], rays_m[5]
        ts_m = jnp.where(hit_m, t_hit_m, 0.0)
        px_m = ox + ts_m * dx_m   # ox/oy/oz are broadcast eye planes
        py_m = oy + ts_m * dy_m
        pz_m = oz + ts_m * dz_m
        fx_m = jnp.clip(px_m - hx_m.astype(jnp.float32), 0.0, 1.0)
        fy_m = jnp.clip(py_m - hy_m.astype(jnp.float32), 0.0, 1.0)
        key_h = jnp.where(hit_m, (hy_m >> 5) * m5 + (hx_m >> 5), BIG_KEY)
        perm_h = jnp.argsort(key_h)
        hplanes = [pid_m, res_m[0], hx_m, hy_m, t_hit_m, fx_m, fy_m]
        if config.shadows:
            hplanes += [px_m, py_m, pz_m]
        hrows_s = jnp.take(_pack_rows(*hplanes), perm_h, axis=0)
        cols = _unpack_rows(hrows_s, [jnp.int32] * 4
                            + [jnp.float32] * (len(hplanes) - 4))
        pid_h = cols[0]
        hcols = [cols[1], cols[2], cols[3], cols[5], cols[6]]
        t_hit_h = cols[4]
        pos_s = cols[7:]
        shaded = shade_pass(shade_b, albedo_b, *hcols, m5=m5,
                            textured=bool(config.texture
                                          and albedo_b is not None),
                            interpret=interpret)
        inv_h = jnp.zeros(P, jnp.int32).at[pid_h].set(
            jnp.arange(P, dtype=jnp.int32))
        frows = jnp.take(_pack_rows(cols[1], t_hit_h, *shaded),
                         inv_h, axis=0)
        fcols = _unpack_rows(frows, [jnp.int32] + [jnp.float32] * 7)
        hit = fcols[0] != 0
        t_hit = fcols[1]
        nx_s, ny_s, nz_s, ar, ag, ab = fcols[2:]
        ts = jnp.where(hit, t_hit, 0.0)

    lx, ly, lz = light.sun_dir[0], light.sun_dir[1], light.sun_dir[2]
    diff = sh.lambert(nx_s, ny_s, nz_s, lx, ly, lz)

    # ---------------- shadows: reuse the hit-column ordering --------------
    occ = jnp.zeros(P, bool)
    if config.shadows:
        # shadow rays start at the primary hit cells, whose column order
        # is exactly the shade pass's hit sort — build them DIRECTLY in
        # hit-sorted order (hit positions rode the hrows gather as 3
        # extra columns; normals are the shade pass's sorted output;
        # _init_state is elementwise, so evaluating it after the
        # permutation is bit-identical to permuting its launch-order
        # output) and skip both the shadow march's round-0 sort and the
        # old separate 8-plane pre-permute gather (perm0 inverts at the
        # end). The payload-sort modes (1/3) keep the launch-order +
        # pre-permute path: their shade gather has no column to ride.
        if legacy_flow:
            sxo = px + lx * SHADOW_EPS + nx_s * SHADOW_EPS
            syo = py + ly * SHADOW_EPS + ny_s * SHADOW_EPS
            szo = pz + lz * SHADOW_EPS + nz_s * SHADOW_EPS
            srays = (jnp.where(hit, sxo, -1e6), jnp.where(hit, syo, -1e6),
                     szo,
                     jnp.broadcast_to(lx, (P,)), jnp.broadcast_to(ly, (P,)),
                     jnp.broadcast_to(lz, (P,)))
            sstate = _init_state(*srays, hit, gmax, n=n, levels=levels,
                                 clip=config.clip_box, m=m,
                                 start_cell=(hx, hy))
            sp = jnp.take(_pack_rows(*srays[:3], *sstate), perm_h, axis=0)
            spc = _unpack_rows(sp, [jnp.float32] * 3 + state_dts)
            srays = tuple(spc[:3]) + srays[3:]
            sstate = tuple(spc[3:])
            shit, _, _, _ = full_march(
                srays, sstate, skip_pass0=True,
                rounds_n=(len(shadow_prefixes)
                          if shadow_prefixes is not None
                          else min(rounds, 2)),
                prefixes_n=shadow_prefixes,
                sort_ray_planes=(0, 1, 2), perm0=perm_h)
            occ = shit
        else:
            px_s, py_s, pz_s = pos_s
            hit_s = hcols[0] != 0
            sxo_s = px_s + lx * SHADOW_EPS + shaded[0] * SHADOW_EPS
            syo_s = py_s + ly * SHADOW_EPS + shaded[1] * SHADOW_EPS
            szo_s = pz_s + lz * SHADOW_EPS + shaded[2] * SHADOW_EPS
            srays = (jnp.where(hit_s, sxo_s, -1e6),
                     jnp.where(hit_s, syo_s, -1e6), szo_s,
                     jnp.broadcast_to(lx, (P,)), jnp.broadcast_to(ly, (P,)),
                     jnp.broadcast_to(lz, (P,)))
            sstate = _init_state(*srays, hit_s, gmax, n=n, levels=levels,
                                 clip=config.clip_box, m=m,
                                 start_cell=(hcols[1], hcols[2]))
            # perm0 seeds the shadow march's composed permutation with
            # the launch pids, so its round-final pid plane scatters the
            # occlusion bits straight back to launch order — no (P,4)
            # inversion gather at all
            sres, _, spid = full_march(
                srays, sstate, skip_pass0=True,
                rounds_n=(len(shadow_prefixes)
                          if shadow_prefixes is not None
                          else min(rounds, 2)),
                prefixes_n=shadow_prefixes,
                sort_ray_planes=(0, 1, 2), perm0=pid_h,
                return_sorted=True)
            occ = (jnp.zeros(P, jnp.int32).at[spid].set(sres[0]) != 0)
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
                         first_budget: int = 0, rounds: int = 2,
                         round_budget: int = 256, n_col: int = 3,
                         l0_tail: bool | str = "auto",
                         subserve: bool = True,
                         band_tail: bool | int | str = "auto",
                         unroll: int = 8, row0=None,
                         full_height: int | None = None,
                         round_prefixes: tuple | str | None = "auto",
                         shadow_prefixes: tuple | str | None = "auto",
                         sort_dir: int = 0,
                         relax: int = 0,
                         banks: int | None = None,
                         coarse0: int | None = None,
                         sort_mode: int = 4,
                         fold_inv: bool = False) -> Frame:
    """Compacted-wavefront render (see module docstring).

    first_budget/rounds/round_budget/n_col: compaction schedule — the
    screen-order pass budget, number of python-unrolled resort rounds
    (the last is unbudgeted, guaranteeing completion), per-round budget,
    and columns served per demand-loop iteration. Defaults are the
    measured B3 (4096^2, 1920x1080) optimum: first_budget=0 runs ONLY
    the zero-DMA coarse phase in screen order (budgeted screen-order
    demand loops are DMA-latency-bound on incoherent blocks — measured
    968 ms for round 0 at budget 96 vs ~150 ms coarse-only), then two
    globally-sorted subserve rounds at unroll=8 (BENCH_NOTES round-3:
    B3 2116 ms, B4 347 ms, vs 2652/706 for the round-2 block-global
    (0,2,512,4) schedule).

    l0_tail: the forced-level-0 tail kernel wins when survivors are
    grazing-bound (B3 2038 ms, -4%; B2 100 vs 112) but costs ~2x when
    they still take pyramid skips (B4 669 vs 347). "auto" (default)
    picks per frame via lax.cond on the survivors' level mix
    (L0_TAIL_AUTO_THRESH): measured B3 2087 / B4 340 / B2 100 — the
    best of both within cond overhead. band_tail (band-granular tail
    serving; value = band height in cell rows, legacy True == 4;
    DEFAULT "auto" = 16 on maps >= 2048^2 else 8): the r4d/r4e band
    curve on B3 is 4: 1860, 8: 1597, **16: 1474**, 32: 1692, none:
    1688; on B2 (1024^2) band8 85 vs band16 99; inert on B4 where the
    auto tail selects the non-tail branch. Sweep history:
    (96,3,256,2) 3522 ms, (96,2,384,4) 2882, (0,3,320,4) 2829,
    (0,2,512,4) 2652, (0,4,256,8) 3725.

    round_prefixes/shadow_prefixes: per-round population prefixes for
    the primary/shadow march — round r sorts and marches only the first
    round_prefixes[r] rays (each sort compacts alive lanes to the
    front; a full-population unbudgeted guard round completes anything
    a prefix missed, so any schedule is exact). Overrides `rounds` with
    its length. round_budget may be a per-round tuple. DEFAULT is
    "auto" for both since the round-4 battery: primary (P, P/2, P/4,
    P/4) + shadow (P, P/4) measured B3 1694 ms vs 2049 for the
    unsliced round-3 default (-17%; 1595 with band_tail=8), B2 93 vs
    109, B4 320 vs 336 (BENCH_NOTES.md round-4 battery). Pass None
    for unsliced rounds.

    sort_dir: refine every resort key with the ray's xy direction
    octant (1 = subordinate to the record key, 2 = octant-major), so
    lanes that exit a record together enter the same next record and
    blocks stay coherent BETWEEN resorts. Pure permutation choice —
    exact for any value; a perf knob for the measured served/alive
    density loss (BENCH_NOTES diag: 62% in the unbudgeted tail pass).

    banks: independent (8,128) ray wavefronts interleaved per kernel
    instance (march_pass banks) — the ILP lever against the measured
    VPU latency trap: one dependency chain sees only ~0.3-1.4G
    (8,128)-ops/s of the chip's measured 3.1-6.6G issue ceiling, and
    independent gather chains overlap completely (tools/micro_vpu.py,
    BENCH_NOTES round-5). Bit-exact for any value; a pure perf knob.
    None (default) = 3 when compiled for TPU (measured B3 curve,
    paired runs: banks=1 1475 / 2 1088 / 3 1060 / 4 1113 ms), 1 under
    the interpreter (banks multiply interpreter wall time, and the ILP
    they buy only exists on hardware).

    coarse0: pass-0 coarse-descent cap (None = full descent, the
    default). A small int runs only a SHALLOW screen-order descent
    before the first sort; 0 skips pass 0 entirely and sorts round 0
    by the level-0 entry column (the pass-0 fold experiment, VERDICT
    r4 next #5). Any value is exact — the guard/unbudgeted rounds
    complete whatever pass 0 leaves.

    sort_mode: how each resort permutes the lanes. 0 =
    jnp.argsort + f32 row-matrix pack + (P,12) row-gather; 1 = one
    lax.sort(num_keys=1) carrying iota + the 12 state/result planes as
    payload operands (i32 planes ride natively — no value converts, no
    row gather; the micro_sort `sort_payload` row); 2 = payload sort
    for march resort rounds only; 3 = payload sort for the shade sort
    only (2/3 bisect where mode 1's measured in-context loss lives —
    isolated payload sort WINS by 90 ms/full-P round on micro_sort yet
    mode 1 lost 150 ms/frame on the r5 sweep). The permutation differs
    only in equal-key order, which is pure serving policy — all modes
    are exact. 4 (DEFAULT since round 5) = SLIM FUSED argsort + row
    gather: planes live in disjoint lane states share a column
    (hx/hy==icx/icy at hit, t_hit overwrites the dead march t,
    alive/lvl/hit pack to 7 bits) and the perm_tot composition rides
    as a pid column, so each resort gathers 8 columns in ONE take
    instead of 12 + a separate full-plane take. Bit-exact: merged
    slots are dead-lane state (never observable — serving keys are
    alive-masked) or restored by the unpack selects. Measured B3
    paired (one process, shipping defaults): mode 0 1058 / mode 4
    967 ms (-8.6%, BENCH_NOTES round-5 slim-gather battery).

    fold_inv: False (default) = the march inverts to launch order
    internally, shading re-sorts + inverts separately, shadows
    pre-permute by the shade permutation. True = the FOLDED-INVERSION
    experiment (post-mortem #14): the march returns round-final order
    + the composed launch-pid map, the shade sort runs on march-order
    planes, one final gather restores launch order, and shadows start
    in hit-sorted order and scatter occlusion straight back — fewer
    but wider gathers, measured +27 ms at mode 4 (994 vs 967) and +5
    at mode 0 (1063 vs 1058): Mosaic's gather cost is per-invocation
    AND fusion-structure bound, so deleting two narrow gathers while
    widening the survivors does not pay (the #13 lesson again). Both
    flows are exact (hit masks equal the oracle's; equal-key sort
    order differs, so images are bit-identical only within one flow).

    relax: RELAXED tail stride in cells (0 = exact, the default). When
    set, the final tail round samples the cell surface every `relax`
    cells and replays the exact DDA walk only inside detected brackets
    (march_body.wavefront_step_l0_relaxed) — the fidelity-bar
    experiment of VERDICT r3 #4. NOT bit-exact: features narrower than
    `relax` cells along the ray can be tunneled (no false hits; detected
    hits carry exact t). Requires the l0 tail (use l0_tail=True; with
    "auto" it applies only when the tail branch is selected). Fidelity
    deltas: tools/fidelity_relaxed.py.
    """
    if relax and l0_tail is False:
        # relax is a level-0 tail mode: without the tail it would
        # silently no-op and return an exact render (ADVICE r4 #5)
        raise ValueError("relax>0 requires the l0 tail (l0_tail=True, or "
                         "'auto' to relax only when the tail branch is "
                         "selected)")
    gmax = scene.pyr_flat[-1]
    if band_tail == "auto":
        # the serving-record-height optimum scales with the map: the
        # r4d/r4e band curve has its minimum at 32x16 on B3/B4-class
        # maps (B3 1474 vs 1597 at 8) but at 32x8 on 1024^2 (B2 85 vs
        # 99 at 16) — smaller maps have shorter grazing runs per
        # column, so the bigger record wastes its extra rows
        band_tail = 16 if scene.m >= 2048 else 8
    band_tail = 4 if band_tail is True else int(band_tail)
    if banks is None:
        # measured default (r5/r5c batteries): 3 independent wavefronts
        # fill the VPU issue slots one chain leaves idle (B3 paired run:
        # banks=1 1475 / 2 1088 / 3 1060 / 4 1113 ms — VMEM/register
        # pressure wins past 3); interpreter runs pay the Nx wall time
        # without the hardware ILP, so CI stays at 1
        banks = 1 if interpret else 3
    LB = LANES * banks
    P = -(-config.height * config.width // LB) * LB
    if round_prefixes == "auto":
        # shrink-with-survivors policy: full first sorted round, then
        # halving slices with a 1/4 tail (the guard round makes any
        # sizing exact — mis-sized slices only shift work to it).
        # DEFAULT since the r4 battery: 4 rounds (1,2,4,4) beat 6 and 8
        # uniformly on B3 (1694 vs 1726 with the shadow prefix, 1595 vs
        # 1641 with band-8), B2 93 vs 109, B4 320 vs 336
        # (BENCH_NOTES.md round-4 battery tables). Round count scales
        # with how much compaction can pay: below ~64k rays the extra
        # sorts/passes dominate (and CI's interpret-mode frames stay
        # fast), so tiny frames slice once.
        round_prefixes = ((P, P // 2, P // 4, P // 4) if P >= 64 * 1024
                          else (P, P // 4))
    if shadow_prefixes == "auto":
        shadow_prefixes = (P, P // 4)
    if round_prefixes is not None:
        rounds = len(round_prefixes)
        round_prefixes = tuple(int(p) for p in round_prefixes)
    if shadow_prefixes is not None:
        shadow_prefixes = tuple(int(p) for p in shadow_prefixes)
    return _render_compact_jit(
        camera, scene.light, packed.coarse, packed.columns,
        packed.shade, packed.albedo, gmax, config=config, n=scene.n,
        m=scene.m, levels=scene.levels, m5=packed.m5, l32=packed.l32,
        interpret=interpret, first_budget=first_budget, rounds=rounds,
        round_budget=round_budget, n_col=n_col, l0_tail=l0_tail,
        subserve=subserve, band_tail=band_tail,
        unroll=unroll, row0=row0, full_height=full_height,
        prefixes=round_prefixes, shadow_prefixes=shadow_prefixes,
        sort_dir=sort_dir, relax=int(relax), banks=banks,
        coarse0=coarse0, sort_mode=sort_mode, fold_inv=fold_inv)
