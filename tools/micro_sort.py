#!/usr/bin/env python
"""Microbenchmark: what would replace the argsort compaction rounds?

VERDICT r4 next #2: the resort keys are small bounded ints (column ids
< m5^2 = 16384 on B3; band keys < 32768; dead lanes = BIG_KEY), yet every
round pays a general jnp.argsort (~35 ms at P=2.07M) plus a (P,12)
row-gather (~47 ms). This tool times the building blocks of every
counting/radix-sort alternative next to the incumbents, on the real
chip, so the replace-or-post-mortem decision is measured:

  argsort      — the incumbent permutation
  sort_kv      — lax.sort((key, iota)) (what argsort lowers to)
  sort_payload — lax.sort((key, 12 planes)): payload rides the sort
                 network, no row gather afterwards
  row_gather   — jnp.take((P,12), perm) — the incumbent's second half
  plane_gather — jnp.take((P,), perm) — per-plane cost
  scatter_inv  — zeros.at[perm].set(iota) — the inversion scatter
  bincount     — jnp.bincount(key, 16384): XLA scatter-add histogram
                 (pass 1 of any counting sort)
  hist128      — (key>>7 == iota(128)).sum(0): fused compare-reduce
                 histogram over 128 coarse buckets
  cumsum128    — 128 bucket-indicator cumsums over P + select: the
                 rank-within-bucket kernel a 128-radix pass needs
  scatter_kv   — scatter (key,iota) pairs to computed positions: the
                 data movement of ONE radix pass

Timing per bench/timing.py hazards: salted input + value fetch.
Run: PYTHONPATH=.:/root/.axon_site python tools/micro_sort.py
"""
import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

P = 2073600  # B3 ray count (pre-pad)
PK = -(-P // 1024) * 1024
K = 16384    # B3 column-key domain (m5^2 at 4096^2)
BIG_KEY = 2 ** 30


def _mkkeys(rng, alive_frac=0.6):
    # spatially-coherent-ish bounded keys with a dead-lane tail, like a
    # mid-march resort: alive lanes carry a column id, dead lanes BIG_KEY
    base = (rng.integers(0, K, PK)).astype(np.int32)
    alive = rng.random(PK) < alive_frac
    return jnp.asarray(np.where(alive, base, BIG_KEY), jnp.int32)


@jax.jit
def f_argsort(key):
    return jnp.argsort(key)


@jax.jit
def f_sort_kv(key):
    _, perm = jax.lax.sort((key, jnp.arange(PK, dtype=jnp.int32)),
                           num_keys=1)
    return perm


@jax.jit
def f_sort_payload(key, rows):
    ops = (key,) + tuple(rows[:, i] for i in range(12))
    out = jax.lax.sort(ops, num_keys=1)
    return out[1]


@jax.jit
def f_sort_payload_mix(key, rows):
    # the production payload mix: ~5 f32 + 7 i32 planes (state/res are
    # mostly i32). If this is much slower than sort_payload, the mixed
    # dtypes are what sank sort_mode=1 in context (r5 sweep: +150 ms).
    ops = (key,) + tuple(rows[:, i] for i in range(5)) + tuple(
        rows[:, i].astype(jnp.int32) for i in range(5, 12))
    out = jax.lax.sort(ops, num_keys=1)
    return out[1]


@jax.jit
def f_sort_payload_bc(key, rows):
    # mixed planes bitcast to f32 so the sort sees uniform payload
    # dtypes (payloads are never compared, so bitcast is exact)
    ops = (key,) + tuple(rows[:, i] for i in range(5)) + tuple(
        jax.lax.bitcast_convert_type(rows[:, i].astype(jnp.int32),
                                     jnp.float32) for i in range(5, 12))
    out = jax.lax.sort(ops, num_keys=1)
    return out[1]


@jax.jit
def f_row_gather(rows, perm):
    return jnp.take(rows, perm, axis=0)


@jax.jit
def f_plane_gather(plane, perm):
    return jnp.take(plane, perm)


@jax.jit
def f_scatter_inv(perm):
    return jnp.zeros(PK, jnp.int32).at[perm].set(
        jnp.arange(PK, dtype=jnp.int32))


@jax.jit
def f_bincount(key):
    kc = jnp.minimum(key, K)  # dead lanes -> one overflow bucket
    return jnp.bincount(kc, length=K + 1)


@jax.jit
def f_hist128(key):
    d1 = jnp.minimum(key >> 7, 128).astype(jnp.int32)
    return (d1[:, None] == jnp.arange(129, dtype=jnp.int32)[None, :]).astype(
        jnp.int32).sum(axis=0)


@jax.jit
def f_cumsum128(key):
    # rank-within-coarse-bucket: 128 indicator cumsums + masked select.
    # Written the only way XLA can avoid a (P,129) materialization: a
    # python loop of (P,) cumsums accumulated under the bucket mask.
    d1 = jnp.minimum(key >> 7, 128).astype(jnp.int32)
    rank = jnp.zeros(PK, jnp.int32)
    for b in range(129):
        ind = (d1 == b).astype(jnp.int32)
        rank = jnp.where(d1 == b, jnp.cumsum(ind) - 1, rank)
    return rank


@jax.jit
def f_scatter_kv(key, pos):
    out_k = jnp.zeros(PK, jnp.int32).at[pos].set(key)
    out_v = jnp.zeros(PK, jnp.int32).at[pos].set(
        jnp.arange(PK, dtype=jnp.int32))
    return out_k, out_v


def _time(fn, mk_args, reps=3):
    fn(*mk_args(0))  # compile
    ts = []
    for r in range(1, reps + 1):
        args = mk_args(r)
        t0 = time.perf_counter()
        out = fn(*args)
        if isinstance(out, tuple):
            out = out[0]
        float(jnp.sum(out[:64].astype(jnp.float32)))
        ts.append((time.perf_counter() - t0) * 1e3)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="")
    args = ap.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()
    rng = np.random.default_rng(0)
    keys = [_mkkeys(rng) for _ in range(4)]
    rows = [jnp.asarray(rng.standard_normal((PK, 12)), jnp.float32)
            for _ in range(4)]
    perms = [f_argsort(k) for k in keys]

    cases = {
        "argsort": (f_argsort, lambda r: (keys[r],)),
        "sort_kv": (f_sort_kv, lambda r: (keys[r],)),
        "sort_payload": (f_sort_payload, lambda r: (keys[r], rows[r])),
        "sort_pay_mix": (f_sort_payload_mix, lambda r: (keys[r], rows[r])),
        "sort_pay_bc": (f_sort_payload_bc, lambda r: (keys[r], rows[r])),
        "row_gather": (f_row_gather, lambda r: (rows[r], perms[r])),
        "plane_gather": (f_plane_gather, lambda r: (rows[r][:, 0],
                                                    perms[r])),
        "scatter_inv": (f_scatter_inv, lambda r: (perms[r],)),
        "bincount": (f_bincount, lambda r: (keys[r],)),
        "hist128": (f_hist128, lambda r: (keys[r],)),
        "cumsum128": (f_cumsum128, lambda r: (keys[r],)),
        "scatter_kv": (f_scatter_kv, lambda r: (keys[r], perms[r])),
    }
    print(f"P={PK} K={K} (B3 resort shape); median of 3, salted")
    for name, (fn, mk) in cases.items():
        if name in skip:
            continue
        try:
            ms = _time(fn, mk)
            print(f"{name:13s}: {ms:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:13s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
