"""Multi-chip animation timing (B5, BASELINE.json:11)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from hmrt_tpu.api.flythrough import frame_camera
from hmrt_tpu.bench.timing import time_animation
from hmrt_tpu.config import RenderConfig
from hmrt_tpu.distrib.mesh import _render_sharded_jit
from hmrt_tpu.types import Camera, Scene


def time_animation_sharded(scene: Scene, cams: Camera, config: RenderConfig,
                           n_frames: int, mesh, reps: int = 3) -> dict:
    @partial(jax.jit, static_argnames=("config", "n_frames", "mesh"))
    def scan(scene, cams, salt, config, n_frames, mesh=mesh):
        def step(carry, i):
            cam = frame_camera(cams, i)
            cam = Camera(eye=cam.eye + salt, target=cam.target, up=cam.up,
                         fov_y=cam.fov_y)
            fr = _render_sharded_jit(scene, cam, config, mesh)
            return carry + jnp.sum(fr.color[::16, ::16]), None

        acc, _ = jax.lax.scan(step, jnp.float32(0.0),
                              jnp.arange(n_frames, dtype=jnp.int32))
        return acc

    return time_animation(scene, cams, config, n_frames, reps=reps,
                          render_scan=scan)
