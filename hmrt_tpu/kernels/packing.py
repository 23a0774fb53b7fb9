"""Brick-packed scene layout for the Pallas raycast kernel.

The reference binds the heightfield and mip pyramid as CUDA textures and
lets the texture units serve arbitrary per-thread reads (SURVEY.md C21).
A TPU has no texture unit: Mosaic's only fast dynamic access is a lane
shuffle within 128-lane vector registers, and HBM can only be reached with
scalar-indexed DMA. The TPU-native equivalent of "texture fetch" is
therefore a software-managed brick scheme (this module + kernels/raycast):

  * the terrain is split into 32x32-cell COLUMNS; each column's record
    packs its pyramid cascade for levels >= 1 — the 16x16 level-1 block,
    8x8, ..., plus one ancestor value per coarser bricked level — AND the
    4 per-cell corner heights, into one (36, 128) f32 record (18 KB).
    Level 0 stores NO cascade block: a level-0 cell's pyramid max is
    exactly max(z00, z10, z01, z11) of its corners (core/pyramid.py
    cell_maxes), so the kernel derives it from the corner gather it needs
    for the exact test anyway — the cascade gather shrinks from 11 rows
    to 3 and the skip test stays bit-identical. A marching tile DMAs the
    single record its rays currently demand (scalar column id = min over
    lanes) and a lane then descends/ascends/marches through every level
    and runs exact intersections with in-register lane-shuffle gathers,
    no further HBM traffic until it leaves the column sideways;
  * levels with side <= 32 (<= 1365 cells in total) are packed into one
    (16, 128) "coarse" buffer that rides in VMEM for the whole kernel —
    rays cruise the empty sky over the terrain without touching HBM at all;
  * per-cell corner-GRADIENT bricks (for shading normals; precomputed
    central differences bilinearly interpolated in-kernel — identical math
    to the oracle's gradient_normal) and 4-corner RGB albedo bricks ride a
    separate demand loop that runs once per hit.

Column record row layout (rows of 128 lanes):
    rows 0-1   level-1 block (256)
    row 2      level-2 (64) | level-3 (16) | level-4 (4) | level-5 (1)
               | ancestor values for bricked levels >= 6 (1 each)
    row 3      padding
    rows 4-35  corner heights, BAND-MAJOR: row 4 + 4*k + ch holds corner
               channel ch (z00,z10,z01,z11) for in-column cells
               f0 = ly*32 + lx in [128k, 128k+128) — i.e. the 4 channel
               rows of each 32x4-cell BAND (4 consecutive cell rows) are
               CONTIGUOUS, so the compact tail can DMA one band as a
               single (4, 128) copy and gather its corners with one
               lane-take per channel (no 8-row scan). Gathers that span
               the whole column still scan 8 chunks x 4 channels — same
               op count as the old channel-major order.
In-column index at level l >= 1: off(l) + ly*(32>>l) + lx with lx/ly =
cell coords masked to the column (closed-form lane arithmetic in the
kernel); level 0 reads the corner rows at 4*(f0>>7) + ch, lane f0&127.

Rejected round-2 experiments (kept here so they are not retried blind;
numbers in BENCH_NOTES.md "Deferred-test post-mortem"): a separate
level-0 max block (rows 4-11) feeding a cheap skip-only scan step, with
the exact corner test DEFERRED — parked lanes batch-flushed every K
iterations (B3 4.11 s vs 2.62 s baseline), and on top of that RUNAHEAD
stepping (consume a whole run of skippable cells per iteration, 5.75 s).
Both lose for the same measured reason: on grazing/terrain-hugging rays
the level-0 cell-max test fails on a large fraction of steps (single-cell
maxima sit above the grazing band just like the 2x2 ones), so the exact
corner test is needed nearly every iteration and any architecture that
defers it only adds stall + duplicate work. A bf16 round-up variant of
the max block was worse still (3.98 s even before runahead): grazing
clearance is smaller than a bf16 ulp of the height scale, so the
conservative bound parked almost every step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hmrt_tpu.core.pyramid import NEG_INF, build_levels
from hmrt_tpu.types import Scene, _pytree_dataclass

BRICK = 32                 # cells per column side
COARSE_SIDE = 32           # levels at or below this side stay in VMEM
COL_CASC_ROWS = 3          # rows holding the level >= 1 cascade (<= 384 vals)
COARSE_ROWS = 16           # coarse buffer shape (COARSE_ROWS, 128)
COL_ROWS = 36              # rows per packed column record
CORNER_ROW = 4             # first row of the corner channels


def cascade_offsets(l32: int) -> list:
    """In-record flat offset of each bricked level's block (python ints),
    for levels 1..l32-1. Entry [l] is level l's offset; entry [0] is a
    placeholder — level 0 has no cascade block (its max is derived from
    the corner channels in-kernel)."""
    offs, pos = [0], 0
    for l in range(1, l32):
        offs.append(pos)
        side = max(BRICK >> l, 1)
        pos += side * side
    return offs


def brick_offset(m5: int, level: int) -> int:
    """First global brick id of bricked level `level` (closed form)."""
    mm = m5 * m5
    return ((mm - (mm >> (2 * level))) * 4) // 3


def num_bricks(m5: int) -> int:
    return brick_offset(m5, m5.bit_length())  # all levels


@_pytree_dataclass(meta_fields=("m5", "l32", "nb0"))
class PackedScene:
    """Device-resident brick-packed scene (see module docstring).

    meta: m5 = bricks per side at level 0; l32 = number of bricked levels
    (levels 0..l32-1 are bricked, l32.. are in `coarse`); nb0 = m5.
    """

    coarse: jax.Array    # (16, 128) f32 — levels with side <= 32, flat-packed
    columns: jax.Array   # (m5^2, 36, 128) f32 — per-column cascade + corners
    shade: jax.Array     # (NB0, 8, 8, 128) f32 — corner gradients gx,gy x 4
    albedo: jax.Array | None  # (NB0, 12, 8, 128) f32 — RGB at 4 cell corners
    m5: int
    l32: int
    nb0: int


def _to_bricks(level_arr: jax.Array) -> jax.Array:
    """(side, side) -> (nb*nb, 8, 128) in brick-major, in-brick row-major."""
    side = level_arr.shape[0]
    nb = side // BRICK
    a = level_arr.reshape(nb, BRICK, nb, BRICK)
    a = a.transpose(0, 2, 1, 3).reshape(nb * nb, BRICK * BRICK)
    return a.reshape(nb * nb, 8, 128)


def _corner_grads(heights: jax.Array):
    """Per-sample central-difference gradients with clamped borders —
    exactly the oracle's grad_at (shading/shade.py gradient_normal)."""
    n = heights.shape[0]
    idx = jnp.arange(n)
    xm = jnp.clip(idx - 1, 0, n - 1)
    xp = jnp.clip(idx + 1, 0, n - 1)
    denom_x = (xp - xm).astype(jnp.float32)
    denom_y = denom_x
    gx = (heights[:, xp] - heights[:, xm]) / denom_x[None, :]
    gy = (heights[xp, :] - heights[xm, :]) / denom_y[:, None]
    return gx, gy


@partial(jax.jit, static_argnames=("n", "m"))
def _pack_arrays(heights: jax.Array, albedo, *, n: int, m: int):
    levels = build_levels(heights)
    m5 = max(m // BRICK, 1)
    l32 = max(m.bit_length() - COARSE_SIDE.bit_length(), 0)  # levels bricked

    # --- coarse buffer: levels l32.. flattened in level-major order ---
    coarse_flat = jnp.concatenate([lvl.reshape(-1) for lvl in levels[l32:]])
    pad = COARSE_ROWS * 128 - coarse_flat.shape[0]
    coarse = jnp.pad(coarse_flat, (0, pad),
                     constant_values=NEG_INF).reshape(COARSE_ROWS, 128)

    # --- packed column records: per-column level cascade for levels >= 1
    # (level 0 has no block — its cell maxes are max(corner channels),
    # bit-identical to cell_maxes, so the kernel derives them in-register)
    blocks = []
    for l in range(1, l32):
        side = max(BRICK >> l, 1)
        lv = levels[l]
        if l <= 5:
            # per-column (side x side) block of level l
            a = lv.reshape(m5, side, m5, side)
            a = a.transpose(0, 2, 1, 3).reshape(m5 * m5, side * side)
        else:
            # ancestor value: one level-l cell covers 2^(l-5) columns
            r = 1 << (l - 5)
            a = jnp.repeat(jnp.repeat(lv, r, axis=0), r, axis=1)
            a = a.reshape(m5 * m5, 1)
        blocks.append(a)
    if blocks:
        casc = jnp.concatenate(blocks, axis=1)      # (m5^2, <= 384)
    else:
        casc = jnp.zeros((m5 * m5, 0), jnp.float32)  # l32 == 1: no cascade

    # --- fine-cell corners, padded cell grid (m x m) ---
    z00 = heights[:-1, :-1]
    z10 = heights[:-1, 1:]
    z01 = heights[1:, :-1]
    z11 = heights[1:, 1:]

    def pad_cells(a):
        # padded cells are never hit (their pyramid max is NEG_INF);
        # replicate edges so no NaNs flow through masked lanes
        return jnp.pad(a, ((0, m - (n - 1)), (0, m - (n - 1))), mode="edge")

    corner_grids = [pad_cells(z) for z in (z00, z10, z01, z11)]
    # band-major interleave (see module docstring): (ch, rec, k, 128) ->
    # (rec, k, ch, 128) so row 4*k + ch of the record is channel ch of
    # in-column chunk k — each 32x4-cell band is 4 contiguous rows
    corner_stack = jnp.stack([_to_bricks(z) for z in corner_grids], axis=0)
    corner_flat = corner_stack.transpose(1, 2, 0, 3).reshape(m5 * m5, 4096)

    # assemble (m5^2, 36, 128) column records
    assert casc.shape[1] <= COL_CASC_ROWS * 128, casc.shape
    pad_c = CORNER_ROW * 128 - casc.shape[1]
    casc = jnp.pad(casc, ((0, 0), (0, pad_c)), constant_values=NEG_INF)
    rec = jnp.concatenate([casc, corner_flat], axis=1)
    rec = jnp.pad(rec, ((0, 0), (0, COL_ROWS * 128 - rec.shape[1])))
    columns = rec.reshape(m5 * m5, COL_ROWS, 128)

    # --- corner gradients for shading normals ---
    gx, gy = _corner_grads(heights)
    chans = []
    for g in (gx, gy):
        chans.extend([g[:-1, :-1], g[:-1, 1:], g[1:, :-1], g[1:, 1:]])
    # order: g00x,g10x,g01x,g11x, g00y,g10y,g01y,g11y
    shade = jnp.stack([_to_bricks(pad_cells(c)) for c in chans], axis=1)

    alb = None
    if albedo is not None:
        # albedo arrives planar (3, N*N); store RGB at all 4 cell corners so
        # the kernel bilinearly filters exactly like the oracle (C18).
        a = albedo.reshape(3, n, n)
        chans = []
        for c in range(3):
            chans.extend([a[c, :-1, :-1], a[c, :-1, 1:],
                          a[c, 1:, :-1], a[c, 1:, 1:]])
        # order: r00,r10,r01,r11, g00,..., b11
        alb = jnp.stack([_to_bricks(pad_cells(ch)) for ch in chans], axis=1)
    return coarse, columns, shade, alb


def pack_scene(scene: Scene) -> PackedScene:
    """Build the brick-packed device layout for a Scene (once per scene)."""
    m = scene.m
    if m < 64:
        raise ValueError("brick kernel needs a padded cell grid of >= 64 "
                         f"(heightmap >= 66 samples); got M={m}")
    coarse, columns, shade, alb = _pack_arrays(
        scene.heights, scene.albedo, n=scene.n, m=m)
    m5 = m // BRICK
    l32 = m.bit_length() - COARSE_SIDE.bit_length()
    return PackedScene(coarse=coarse, columns=columns,
                       shade=shade, albedo=alb,
                       m5=m5, l32=l32, nb0=m5)
