"""Brick-packed scene layout for the Pallas raycast kernel.

The reference binds the heightfield and mip pyramid as CUDA textures and
lets the texture units serve arbitrary per-thread reads (SURVEY.md C21).
A TPU has no texture unit: Mosaic's only fast dynamic access is a lane
shuffle within 128-lane vector registers, and HBM can only be reached with
scalar-indexed DMA. The TPU-native equivalent of "texture fetch" is
therefore a software-managed brick scheme (this module + kernels/raycast):

  * every pyramid level with side >= 64 is split into 32x32-cell BRICKS,
    each stored as one (8, 128) f32 tile = 4 KB = one VMEM vector register
    load; a marching tile DMAs the brick that its rays currently demand
    (scalar brick id = min over lanes) and gathers per-lane cell maxes
    from the in-register brick with lane shuffles;
  * levels with side <= 32 (<= 1365 cells in total) are packed into one
    (16, 128) "coarse" buffer that rides in VMEM for the whole kernel —
    rays cruise the empty sky over the terrain without touching HBM at all;
  * the finest level additionally gets per-cell CORNER bricks (the 4 cell
    corner heights, channels-first) for the exact intersection test, and
    per-cell corner-GRADIENT bricks for shading normals (precomputed
    central differences, bilinearly interpolated in-kernel — identical
    math to the oracle's gradient_normal).

Brick ids use the same closed-form level-major arithmetic as the flat
pyramid, over the brick grid (m5 = M/32 bricks per side at level 0):

    boff(l)  = (m5^2 - (m5^2 >> 2l)) * 4 // 3
    gbid     = boff(l) + (icy >> 5) * (m5 >> l) + (icx >> 5)
    in-brick = (icy & 31) * 32 + (icx & 31)   ->  vreg (f >> 7, f & 127)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hmrt_tpu.core.pyramid import NEG_INF, build_levels
from hmrt_tpu.types import Scene, _pytree_dataclass

BRICK = 32                 # cells per brick side
COARSE_SIDE = 32           # levels at or below this side stay in VMEM
COARSE_ROWS = 16           # coarse buffer shape (COARSE_ROWS, 128)


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
    bricks: jax.Array    # (NB, 8, 128) f32 — all bricked pyramid levels
    corners: jax.Array   # (NB0, 4, 8, 128) f32 — z00,z10,z01,z11 per fine cell
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

    # --- bricks for levels 0..l32-1 ---
    if l32 > 0:
        bricks = jnp.concatenate([_to_bricks(levels[l]) for l in range(l32)])
    else:
        bricks = jnp.zeros((1, 8, 128), jnp.float32)

    # --- fine-cell corners, padded cell grid (m x m) ---
    z00 = heights[:-1, :-1]
    z10 = heights[:-1, 1:]
    z01 = heights[1:, :-1]
    z11 = heights[1:, 1:]

    def pad_cells(a):
        # padded cells are never hit (their pyramid max is NEG_INF);
        # replicate edges so no NaNs flow through masked lanes
        return jnp.pad(a, ((0, m - (n - 1)), (0, m - (n - 1))), mode="edge")

    corners = jnp.stack([_to_bricks(pad_cells(z)) for z in
                         (z00, z10, z01, z11)], axis=1)  # (NB0, 4, 8, 128)

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
    return coarse, bricks, corners, shade, alb


def pack_scene(scene: Scene) -> PackedScene:
    """Build the brick-packed device layout for a Scene (once per scene)."""
    m = scene.m
    if m < 64:
        raise ValueError("brick kernel needs a padded cell grid of >= 64 "
                         f"(heightmap >= 66 samples); got M={m}")
    coarse, bricks, corners, shade, alb = _pack_arrays(
        scene.heights, scene.albedo, n=scene.n, m=m)
    m5 = m // BRICK
    l32 = m.bit_length() - COARSE_SIDE.bit_length()
    return PackedScene(coarse=coarse, bricks=bricks, corners=corners,
                       shade=shade, albedo=alb, m5=m5, l32=l32, nb0=m5)
