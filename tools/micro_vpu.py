#!/usr/bin/env python
"""Microbenchmark: the v5e VPU issue ceiling — latency vs throughput.

bench/floor.py's VPU_VEC_OPS_PER_S = 0.94e9 was measured from the march
tail's single dependency chain, i.e. it ASSUMES single-issue (VERDICT r4
weak #2). This tool pins the ALU latency and the issue ceiling directly:
a while loop carrying `chains` INDEPENDENT (8,128) f32 accumulators,
each advanced by one dependent op per sub-step.

METHOD — slope timing (round-5 discovery): the axon tunnel imposes a
~26-30 ms DISPATCH FLOOR per value-fetched call, which silently
dominated every absolute micro number measured before round 5 (the
round-4 micro_gather "490 ns/iter serial chain" row was the floor, not
the chain). Every number here is therefore a SLOPE between two
iteration counts of the same compiled kernel shape — the floor and any
fixed compile/dispatch cost cancel:

    cost = (t(N2) - t(N1)) / (N2 - N1) per body iteration.

If the chip retires >1 vec-op/cycle given ILP, time per sub-step stays
~constant as `chains` grows until the issue width saturates; the
chains=1 row is the raw dependency-chain latency.

Run on the real chip:
    PYTHONPATH=.:/root/.axon_site python tools/micro_vpu.py
"""
import argparse
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

UNROLL = 16
N1 = 65536        # body iterations, low point
N2 = 65536 * 5    # high point: slope over 4*65536*UNROLL sub-steps


def _alu_kernel(seed_r, iters_r, out_r, *, chains: int, mix: str):
    s = seed_r[:]
    iters = iters_r[0]
    accs = [s + float(i) for i in range(chains)]
    iacc = [(s * (i + 3.0)).astype(jnp.int32) for i in range(chains)]

    def body(c):
        i, accs, iacc = c
        for _ in range(UNROLL):
            if mix == "fma":
                accs = [a * 1.0000001 + 0.25 for a in accs]
            elif mix == "intops":
                iacc = [(a ^ 1234567) + 7 for a in iacc]
            elif mix == "select":
                accs = [jnp.where(a > 0.5, a - 1.0000001, a + 0.9999999)
                        for a in accs]
            else:
                raise ValueError(mix)
        return i + 1, accs, iacc

    _, accs, iacc = jax.lax.while_loop(lambda c: c[0] < iters, body,
                                       (jnp.int32(0), accs, iacc))
    tot = jnp.zeros_like(s)
    for a in accs:
        tot = tot + a
    for a in iacc:
        tot = tot + a.astype(jnp.float32)
    out_r[:] = tot


def _gather_kernel(seed_r, iters_r, out_r, buf_scr, *, chains: int,
                   fma_chains: int):
    """`chains` independent serial gather chains (each: 8-row x 1-channel
    take-scan whose next index depends on the gathered value) +
    `fma_chains` independent ALU chains riding alongside — the dual-issue
    probe: do ALU ops hide under gather latency?"""
    buf_scr[...] = jnp.broadcast_to(seed_r[:], (8, 8, 128)).astype(
        jnp.float32)
    s = seed_r[:]
    iters = iters_r[0]
    f0s = [(s * (i + 2.0)).astype(jnp.int32) & 1023 for i in range(chains)]
    gs = [jnp.zeros((8, 128), jnp.float32) for _ in range(chains)]
    accs = [s + float(i) for i in range(fma_chains)]

    def gather_one(f0):
        col = f0 & 127
        row = (f0 >> 7) & 7
        z = jnp.zeros(f0.shape, jnp.float32)
        for k in range(8):
            rowk = jnp.broadcast_to(buf_scr[k, 0:1, :].reshape(1, 128),
                                    f0.shape)
            got = jnp.take_along_axis(rowk, col, axis=1)
            z = jnp.where(row == k, got, z)
        return z

    def body(c):
        i, f0s, gs, accs = c
        for _ in range(UNROLL):
            zs = [gather_one(f0) for f0 in f0s]
            gs = [g + z for g, z in zip(gs, zs)]
            f0s = [(f0 + z.astype(jnp.int32) * 5 + 1) & 1023
                   for f0, z in zip(f0s, zs)]
            accs = [a * 1.0000001 + 0.25 for a in accs]
        return i + 1, f0s, gs, accs

    _, _, gs, accs = jax.lax.while_loop(lambda c: c[0] < iters, body,
                                        (jnp.int32(0), f0s, gs, accs))
    tot = jnp.zeros_like(s)
    for g in gs:
        tot = tot + g
    for a in accs:
        tot = tot + a
    out_r[:] = tot


def _mk_run(kernel, scratch=False, **kw):
    @jax.jit
    def run(seed, iters):
        return pl.pallas_call(
            functools.partial(kernel, **kw),
            grid=(1,),
            in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=([pltpu.VMEM((8, 8, 128), jnp.float32)]
                            if scratch else []),
        )(seed, iters)
    return run


def _slope_ns(run, reps=3):
    """ns per body iteration: slope between N1 and N2, floor-cancelled."""
    import numpy as np
    rng = np.random.default_rng(0)

    def t_at(n):
        seed0 = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)
        run(seed0, jnp.asarray([n], jnp.int32))  # compile+warm
        ts = []
        for _ in range(reps):
            seed = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)
            t0 = time.perf_counter()
            float(jnp.sum(run(seed, jnp.asarray([n], jnp.int32))))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    tl, th = t_at(N1), t_at(N2)
    return (th - tl) * 1e9 / (N2 - N1), tl


OPS_PER_STEP = {"fma": 1, "intops": 2, "select": 4}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mixes", default="fma,intops,select")
    ap.add_argument("--chains", default="1,2,4,8,16")
    ap.add_argument("--skip-gather", action="store_true")
    ap.add_argument("--n1", type=int, default=None,
                    help="low-point body iterations (ALU rows need ~20x "
                         "the default for the slope to clear tunnel noise)")
    ap.add_argument("--n2", type=int, default=None)
    args = ap.parse_args()
    global N1, N2
    if args.n1:
        N1 = args.n1
    if args.n2:
        N2 = args.n2
    chains_list = [int(c) for c in args.chains.split(",")]

    print(f"slope timing N1={N1} N2={N2} UNROLL={UNROLL}; 1 vec-op = one "
          "(8,128) elementwise jnp op")
    for mix in args.mixes.split(","):
        for chains in chains_list:
            run = _mk_run(_alu_kernel, chains=chains, mix=mix)
            ns_iter, floor = _slope_ns(run)
            ns_sub = ns_iter / UNROLL
            vecops = chains * OPS_PER_STEP[mix]
            print(f"{mix:7s} chains={chains:2d}: {ns_sub:7.2f} ns/sub-step "
                  f"({ns_sub / max(vecops, 1):6.2f} ns/vec-op, "
                  f"{vecops / ns_sub:6.2f} G vec-ops/s) "
                  f"[floor {floor * 1e3:.1f} ms]", flush=True)

    if not args.skip_gather:
        print("\ngather chains (8-row x 1-ch serial take-scan) "
              "+ k independent fma chains")
        for chains, fk in ((1, 0), (2, 0), (4, 0), (1, 4), (1, 16),
                           (2, 8)):
            run = _mk_run(_gather_kernel, scratch=True, chains=chains,
                          fma_chains=fk)
            ns_iter, _ = _slope_ns(run)
            ns_sub = ns_iter / UNROLL
            print(f"gather chains={chains} fma={fk:2d}: {ns_sub:7.2f} "
                  f"ns/sub-step", flush=True)


if __name__ == "__main__":
    main()
