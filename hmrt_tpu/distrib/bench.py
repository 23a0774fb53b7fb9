"""Multi-chip animation timing (B5, BASELINE.json:11)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hmrt_tpu.api.flythrough import frame_camera
from hmrt_tpu.bench.timing import time_animation
from hmrt_tpu.config import RenderConfig
from hmrt_tpu.distrib.mesh import render_frame_sharded
from hmrt_tpu.types import Camera, Scene


def time_animation_sharded(scene: Scene, cams: Camera, config: RenderConfig,
                           n_frames: int, mesh, reps: int = 3,
                           hit_frac: float | None = None) -> dict:
    # host-side frame loop: wrapping the sharded pallas render in lax.scan
    # miscompiled/crashed on hardware (see bench/timing.py _loop_frames)
    def loop(scene, cams, salt, config, n_frames):
        acc = 0.0
        for i in range(n_frames):
            cam = frame_camera(cams, i)
            cam = Camera(eye=cam.eye + salt, target=cam.target, up=cam.up,
                         fov_y=cam.fov_y)
            fr = render_frame_sharded(scene, cam, config, mesh)
            acc += float(jnp.sum(fr.color[::16, ::16]))
        return acc

    return time_animation(scene, cams, config, n_frames, reps=reps,
                          render_scan=loop, hit_frac=hit_frac)


def time_flythrough_frames(scene: Scene, cams: Camera, config: RenderConfig,
                           n_frames: int, mesh, reps: int = 3,
                           hit_frac: float | None = None) -> dict:
    """Animation throughput with the FRAME axis sharded over the mesh
    (mesh.render_flythrough_sharded): all frames render as one device
    program, n_chips at a time, zero per-frame ICI traffic — the natural
    multi-chip strategy for the B4 flythrough workload."""
    from hmrt_tpu.distrib.mesh import render_flythrough_sharded

    def scan(scene, cams, salt, config, n_frames):
        cams2 = Camera(eye=cams.eye + salt, target=cams.target, up=cams.up,
                       fov_y=cams.fov_y)
        colors = render_flythrough_sharded(scene, cams2, config, mesh)
        # reduce instead of gather: timing measures render throughput, not
        # host assembly (same salted value-fetch discipline as timing.py)
        return jnp.sum(colors[:, ::16, ::16])

    return time_animation(scene, cams, config, n_frames, reps=reps,
                          render_scan=scan, hit_frac=hit_frac)
