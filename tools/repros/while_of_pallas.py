"""Repro: pallas_call inside lax.while_loop / lax.scan miscompiles on TPU.

Round-1 observation (BENCH_NOTES.md "Platform hazards"): wrapping a
pallas_call in lax.while_loop or lax.scan silently lost hits / crashed the
worker on large scenes, while the SAME rounds run as separate dispatches
were exact. This forced two architectural workarounds that persist in the
tree (kernels/compact.py python-unrolled rounds; bench/timing.py host-side
frame loop). Run this after any jax upgrade; if it prints OK, the
workarounds can be removed.

Usage: python tools/repros/while_of_pallas.py   (needs a TPU backend)
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kern(x_ref, o_ref):
    # a little stateful work per call: masked integer progress like a march
    x = x_ref[:]

    def body(c):
        i, v = c
        v = jnp.where(v < 100.0, v * 1.1 + 0.1, v)
        return i + 1, v

    _, v = jax.lax.while_loop(lambda c: c[0] < 8, body, (jnp.int32(0), x))
    o_ref[:] = v


@functools.partial(jax.jit, static_argnames=())
def one_pass(x):
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(x)


def main():
    x0 = jnp.linspace(0.0, 50.0, 1024, dtype=jnp.float32).reshape(8, 128)

    # reference: python-unrolled separate dispatches
    ref = x0
    for _ in range(4):
        ref = one_pass(ref)
    ref = np.asarray(ref)

    # suspect 1: lax.scan around the pallas_call
    @jax.jit
    def scanned(x):
        def step(c, _):
            return one_pass(c), None
        out, _ = jax.lax.scan(step, x, None, length=4)
        return out

    # suspect 2: lax.while_loop around the pallas_call
    @jax.jit
    def whiled(x):
        def body(c):
            i, v = c
            return i + 1, one_pass(v)
        _, out = jax.lax.while_loop(lambda c: c[0] < 4, body,
                                    (jnp.int32(0), x))
        return out

    bad = False
    for name, fn in [("scan", scanned), ("while", whiled)]:
        got = np.asarray(fn(x0))
        if not np.allclose(got, ref, atol=1e-5):
            bad = True
            print(f"{name}-of-pallas MISMATCH: max|d| = "
                  f"{np.abs(got - ref).max():.3e}")
        else:
            print(f"{name}-of-pallas OK")
    raise SystemExit(1 if bad else 0)


if __name__ == "__main__":
    main()
