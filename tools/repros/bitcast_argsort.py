"""Repro: bitcast_convert_type i32->f32 + argsort + row gather corrupts data.

Round-1 observation (BENCH_NOTES.md "Platform hazards"): packing integer
march state into an f32 row matrix with lax.bitcast_convert_type, then
argsort-permuting the rows with jnp.take, silently corrupted the gathered
values when fused into ONE XLA program with pallas_calls — exact when run
as separate dispatches. Workaround in tree: kernels/compact.py _pack_rows
VALUE-converts (all march ints < 2^24, so the f32 round-trip is exact).
Run after any jax upgrade; if it prints OK the bitcast path is usable
again (it would save the int<->float conversion ops).

Usage: python tools/repros/bitcast_argsort.py   (needs a TPU backend)
"""
import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def roundtrip_bitcast(ints, key):
    rows = jax.lax.bitcast_convert_type(ints, jnp.float32)
    perm = jnp.argsort(key)
    rows_s = jnp.take(rows, perm, axis=0)
    back = jax.lax.bitcast_convert_type(rows_s, jnp.int32)
    return back, perm


@jax.jit
def roundtrip_value(ints, key):
    rows = ints.astype(jnp.float32)
    perm = jnp.argsort(key)
    rows_s = jnp.take(rows, perm, axis=0)
    return rows_s.astype(jnp.int32), perm


def main():
    rng = np.random.default_rng(0)
    P = 1 << 20
    ints = jnp.asarray(rng.integers(0, 1 << 23, (P, 4)), jnp.int32)
    key = jnp.asarray(rng.integers(0, 1 << 14, P), jnp.int32)

    want = np.asarray(ints)[np.asarray(jnp.argsort(key))]
    got_b, _ = roundtrip_bitcast(ints, key)
    got_v, _ = roundtrip_value(ints, key)

    bad = False
    for name, got in [("bitcast", got_b), ("value-convert", got_v)]:
        got = np.asarray(got)
        if not (got == want).all():
            bad = True
            n = int((got != want).sum())
            print(f"{name} MISMATCH: {n} corrupted elements")
        else:
            print(f"{name} OK")
    raise SystemExit(1 if bad else 0)


if __name__ == "__main__":
    main()
