#!/usr/bin/env python
"""Microbenchmark: can the MXU replace the serve gather's row scan?

VERDICT r4 next #3: the corner gather (band_gathers / subserve_gathers,
kernels/march_body.py) is the measured #1 iteration cost and runs
entirely on the VPU while the MXU idles. This tool times the candidate
MXU formulations next to the incumbent chunk scan, slope-timed (the
axon tunnel's ~26-30 ms dispatch floor cancels between two iteration
counts of the same kernel — see tools/micro_vpu.py).

THE ALGEBRA FIRST (why most formulations are impossible): the gather is

    out[s, l] = rec[ row(s,l), s, lane_col(s,l) ]

elementwise in BOTH hardware axes (sublane s, lane l). A matmul needs a
shared contraction axis; one-hot weights OH[s,l,r] over rows r are 3D,
so Sum_r OH[s,l,r]*rec[r,s,l] is a masked multiply-accumulate (VPU
select tree == what the incumbent does), NOT a contraction. The MXU can
only help if the row index is UNIFORM along one hardware axis:

  scan     — incumbent: per record row, native lane-shuffle take +
             row-mask select (band_gathers band16 shape: 4 chunks x 4
             channels x nb banks).
  muladd   — same data flow, selects replaced by OH multiply-add (is
             `where` vs `*,+` material on the VPU? sanity row).
  mxu_row  — per-SUBLANE row fetch: IF serving policy made the in-band
             chunk uniform per sublane, out[s,:] = Sum_r OH[s,r] *
             rec[r,s,:] == diag of (8,16)@(16,1024) — one real MXU op
             (+ 8-select diagonal extraction + the per-lane shuffle
             still done natively on the fetched rows). Times the
             matmul formulation at exactly the band16 record shape.
  mxu_dot  — same contraction via jax.lax.dot_general batch dims
             (einsum 'sr,rsl->sl'); may not compile under Mosaic —
             a FAILED row is itself the answer.

Decision rule: mxu_row must beat scan by enough to pay for the serving
policy it would require (chunk-uniform sublanes = a stricter sort key =
lower serve density, the measured killer of every granularity change).
Run: PYTHONPATH=.:/root/.axon_site python tools/micro_mxu.py
"""
import argparse
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

UNROLL = 8
N1 = 16384
N2 = 16384 * 5

ROWS = 16    # band16 record: 4 chunks x 4 corner channels
NB = 3       # shipping n_col banks
SUBL = 8


def _mk_f0(s):
    # pseudo-random in-record indices that evolve each iteration like a
    # marching wavefront (data-dependent so the chain is real)
    return (s * 1664525 + 12345) & (ROWS * 128 - 1)


def _scan_kernel(seed_r, iters_r, out_r, rec_scr, *, variant: str):
    rec_scr[...] = jnp.broadcast_to(
        jnp.tile(seed_r[:], (1, NB)).reshape(1, SUBL * NB, 128),
        (ROWS, SUBL * NB, 128)).astype(jnp.float32)
    iters = iters_r[0]
    f0 = (seed_r[:] * 37.0).astype(jnp.int32) & (ROWS * 128 - 1)
    bmask = [None] + [(seed_r[:] > (0.3 * b)) for b in range(1, NB)]
    acc = jnp.zeros((8, 128), jnp.float32)

    def gather_scan(f0, muladd=False):
        col = f0 & 127
        kin = (f0 >> 7) & 3
        z = [jnp.zeros(f0.shape, jnp.float32) for _ in range(4)]
        for k in range(4):
            sel = kin == k
            self_f = sel.astype(jnp.float32) if muladd else None
            for ch in range(4):
                r = 4 * k + ch
                g = jnp.take_along_axis(rec_scr[r, 0:8, :], col, axis=1)
                for b in range(1, NB):
                    gb = jnp.take_along_axis(
                        rec_scr[r, 8 * b:8 * b + 8, :], col, axis=1)
                    g = jnp.where(bmask[b], gb, g)
                if muladd:
                    z[ch] = z[ch] + self_f * g
                else:
                    z[ch] = jnp.where(sel, g, z[ch])
        return z

    def gather_mxu_row(f0):
        # chunk-uniform-per-sublane HYPOTHETICAL: row index per sublane =
        # first lane's chunk. One (8, ROWS) one-hot @ (ROWS, 8*128) per
        # channel-merged fetch, diag extraction, then the lane shuffle.
        col = f0 & 127
        k_s = (f0 >> 7)[:, 0:1] & 3     # (8,1) per-sublane chunk
        z = []
        for ch in range(4):
            r_s = 4 * k_s + ch          # (8,1) row per sublane
            oh = (r_s == jax.lax.broadcasted_iota(
                jnp.int32, (8, ROWS), 1)).astype(jnp.float32)
            for b in range(NB):
                flat = rec_scr[:, 8 * b:8 * b + 8, :].reshape(ROWS, 8 * 128)
                full = jnp.dot(oh, flat,
                               preferred_element_type=jnp.float32)
                cube = full.reshape(8, 8, 128)
                # diag: sublane s keeps block s
                g = jnp.zeros((8, 128), jnp.float32)
                for s in range(8):
                    g = jnp.where(
                        jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                        == s, cube[s], g)
                gl = jnp.take_along_axis(g, col, axis=1)
                if b == 0:
                    acc_b = gl
                else:
                    acc_b = jnp.where(bmask[b], gl, acc_b)
            z.append(acc_b)
        return z

    def gather_mxu_dot(f0):
        col = f0 & 127
        k_s = (f0 >> 7)[:, 0:1] & 3
        z = []
        for ch in range(4):
            r_s = 4 * k_s + ch
            oh = (r_s == jax.lax.broadcasted_iota(
                jnp.int32, (8, ROWS), 1)).astype(jnp.float32)
            for b in range(NB):
                rsl = rec_scr[:, 8 * b:8 * b + 8, :]  # (ROWS, 8, 128)
                g = jax.lax.dot_general(
                    oh, rsl, (((1,), (0,)), ((0,), (1,))),
                    preferred_element_type=jnp.float32)
                gl = jnp.take_along_axis(g, col, axis=1)
                if b == 0:
                    acc_b = gl
                else:
                    acc_b = jnp.where(bmask[b], gl, acc_b)
            z.append(acc_b)
        return z

    def body(c):
        i, f0, acc = c
        for _ in range(UNROLL):
            if variant == "scan":
                z = gather_scan(f0)
            elif variant == "muladd":
                z = gather_scan(f0, muladd=True)
            elif variant == "mxu_row":
                z = gather_mxu_row(f0)
            elif variant == "mxu_dot":
                z = gather_mxu_dot(f0)
            else:
                raise ValueError(variant)
            tot = jnp.maximum(jnp.maximum(z[0], z[1]),
                              jnp.maximum(z[2], z[3]))
            acc = acc + tot
            f0 = _mk_f0(f0 + tot.astype(jnp.int32))
        return i + 1, f0, acc

    _, _, acc = jax.lax.while_loop(
        lambda c: c[0] < iters, body,
        (jnp.int32(0), f0, acc))
    out_r[:] = acc


def _mk_run(variant, interpret=False):
    @jax.jit
    def run(seed, iters):
        return pl.pallas_call(
            functools.partial(_scan_kernel, variant=variant),
            interpret=interpret,
            grid=(1,),
            in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((ROWS, SUBL * NB, 128),
                                       jnp.float32)],
        )(seed, iters)
    return run


def _slope_ns(run, reps=3):
    import numpy as np
    rng = np.random.default_rng(0)

    def t_at(n):
        seed0 = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)
        run(seed0, jnp.asarray([n], jnp.int32))
        ts = []
        for _ in range(reps):
            seed = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)
            t0 = time.perf_counter()
            float(jnp.sum(run(seed, jnp.asarray([n], jnp.int32))))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    tl, th = t_at(N1), t_at(N2)
    return (th - tl) * 1e9 / (N2 - N1), tl


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="scan,muladd,mxu_row,mxu_dot")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke (compiles + runs, numbers meaningless)")
    args = ap.parse_args()
    if args.interpret:
        global N1, N2
        N1, N2 = 2, 4
    print(f"band16 x nb={NB} corner-gather formulations; slope-timed "
          f"ns per gather (UNROLL={UNROLL})")
    for v in args.variants.split(","):
        try:
            run = _mk_run(v, interpret=args.interpret)
            ns_iter, floor = _slope_ns(run)
            print(f"{v:8s}: {ns_iter / UNROLL:8.1f} ns/gather "
                  f"[floor {floor * 1e3:.1f} ms]", flush=True)
        except Exception as e:
            print(f"{v:8s}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
