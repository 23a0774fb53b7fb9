#!/usr/bin/env python
"""Microbenchmark: what does one 4-channel corner gather actually cost?

The B3 cost model (BENCH_NOTES.md) assumes a _multi_gather of 4 channels
from an (8,128)-per-channel VMEM record costs ~96 vector ops (8-row scan
x 4 x [broadcast+take+select]) and that the march iteration is ~60% this
gather. This kernel isolates it: a while loop of ITERS iterations doing
G gathers per iteration (G = 0,1,2,4), with the index vector mutated per
iteration so nothing hoists. The slope in G gives ns per gather; the
G=0 row gives the loop's fixed overhead. Run on the real chip:

    PYTHONPATH=.:/root/.axon_site python tools/micro_gather.py
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hmrt_tpu.kernels.march_body import _multi_gather

ITERS = 65536


def _kernel(seed_r, out_r, buf_scr, *, g: int):
    # fill the scratch record once (values irrelevant)
    buf_scr[...] = jnp.broadcast_to(seed_r[:], (32, 8, 128)).astype(
        jnp.float32)
    bufs = tuple(buf_scr[c] for c in range(4))

    def body(c):
        i, f0, acc = c
        # mutate the per-lane index so the gather cannot hoist
        f0 = (f0 * 5 + 1) & 1023
        for k in range(g):
            z = _multi_gather(bufs, (f0 + k) & 1023)
            acc = acc + z[0] + z[1] + z[2] + z[3]
        # baseline arithmetic so g=0 still carries the loop
        acc = acc + f0.astype(jnp.float32)
        return i + 1, f0, acc

    def cond(c):
        return c[0] < ITERS

    f0 = seed_r[:].astype(jnp.int32) & 1023
    acc = jnp.zeros((8, 128), jnp.float32)
    _, _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), f0, acc))
    out_r[:] = acc


@functools.partial(jax.jit, static_argnames=("g",))
def run(seed, *, g):
    return pl.pallas_call(
        functools.partial(_kernel, g=g),
        grid=(1,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((32, 8, 128), jnp.float32)],
    )(seed)


def main():
    import numpy as np
    rng = np.random.default_rng(0)
    results = {}
    for g in (0, 1, 2, 4):
        run(jnp.asarray(rng.standard_normal((8, 128)), jnp.float32), g=g)
        ts = []
        for rep in range(3):
            seed = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)
            t0 = time.perf_counter()
            float(jnp.sum(run(seed, g=g)))
            ts.append((time.perf_counter() - t0) * 1e6)
        best = min(ts)
        results[g] = best
        print(f"g={g}: {best:8.1f} us total, {best*1e3/ITERS:7.2f} ns/iter",
              flush=True)
    for g in (1, 2, 4):
        slope = (results[g] - results[0]) / g
        print(f"  gather cost from g={g}: {slope*1e3/ITERS:6.2f} ns "
              f"(~{slope*1e3/ITERS*0.96:5.0f} lane-op-equivalents... "
              f"x0.96 ops/ns)", flush=True)


if __name__ == "__main__":
    main()
