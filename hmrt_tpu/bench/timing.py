"""Honest frame timing (SURVEY.md C23).

The reference brackets its CUDA kernel with event timers and reports
ms/frame + Mrays/s (metric schema per BASELINE.json:2). Two TPU-specific
hazards are handled here, both observed on real hardware:

  1. remote-tunnel platforms can report async dispatch as "ready"
     (block_until_ready returns early) — so timing FETCHES a scalar
     checksum of the result to host, which cannot complete before the
     computation does;
  2. repeated identical dispatches may be deduplicated — so every timed
     repetition perturbs the camera by a sub-pixel salt (workload
     unchanged, dispatch unique).

Steady-state throughput is measured by scanning F frames inside ONE
device program (`lax.scan` over a batched camera path, like the
reference's frame loop) and dividing; this also amortizes host dispatch
latency out of the per-frame number.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp

from hmrt_tpu.api.flythrough import frame_camera
from hmrt_tpu.config import RenderConfig
from hmrt_tpu.core.renderer import render_frame
from hmrt_tpu.types import Camera, Scene


@partial(jax.jit, static_argnames=("config", "n_frames"))
def _scan_frames(scene: Scene, cams: Camera, salt, config: RenderConfig,
                 n_frames: int):
    """Render n_frames sequentially on device; returns a scalar checksum."""

    def step(carry, i):
        cam = frame_camera(cams, i)
        cam = Camera(eye=cam.eye + salt, target=cam.target, up=cam.up,
                     fov_y=cam.fov_y)
        fr = render_frame(scene, cam, config)
        return carry + jnp.sum(fr.color[::16, ::16]), None

    acc, _ = jax.lax.scan(step, jnp.float32(0.0),
                          jnp.arange(n_frames, dtype=jnp.int32))
    return acc


def _loop_frames(scene, cams, salt, config, n_frames):
    """Host-side frame loop (per-frame dispatch + scalar fetch).

    HISTORY: this was the only safe path for the Pallas backends while
    wrapping pallas_call in lax.scan/while_loop miscompiled on real
    hardware (the worker crashed on large scenes). On jax 0.9.0 the
    full-scale retest PASSES (tools/repros/scan_of_compact_fullscale.py),
    so scan timing is the default again and this loop is kept as an
    opt-out (HMRT_HOST_LOOP_TIMING=1) for future-jax triage; it pays
    ~30 ms/frame of tunnel dispatch that the scan amortizes away.
    """
    acc = 0.0
    for i in range(n_frames):
        cam = frame_camera(cams, i)
        cam = Camera(eye=cam.eye + salt, target=cam.target, up=cam.up,
                     fov_y=cam.fov_y)
        fr = render_frame(scene, cam, config)
        acc += float(jnp.sum(fr.color[::16, ::16]))
    return acc


def time_animation(scene: Scene, cams: Camera, config: RenderConfig,
                   n_frames: int, reps: int = 3,
                   render_scan=None, hit_frac: float | None = None) -> dict:
    """ms/frame (median over reps) for an n_frames animation.

    `hit_frac` (fraction of pixels that hit terrain, measured on a real
    frame by the caller) makes the shadow-ray count honest: shadow rays
    exist only for hit pixels, so total rays/frame = W*H*(1 + hit_frac)
    when shadows are on — NOT W*H*2, which would overstate Mrays/s on
    sky-heavy views. Primary-only Mrays/s is always reported alongside.
    """
    import os
    if os.environ.get("HMRT_HOST_LOOP_TIMING") and render_scan is None:
        scan = _loop_frames
    else:
        scan = render_scan or _scan_frames
    # compile + settle buffers
    float(scan(scene, cams, jnp.zeros(3, jnp.float32), config, n_frames))
    times = []
    for rep in range(1, reps + 1):
        salt = jnp.asarray([rep * 1e-4, -rep * 1e-4, rep * 1e-4], jnp.float32)
        t0 = time.perf_counter()
        float(scan(scene, cams, salt, config, n_frames))
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    ms = med / n_frames * 1e3
    primary = config.width * config.height
    shadow_mult = (1.0 + (hit_frac if hit_frac is not None else 1.0)
                   if config.shadows else 1.0)
    rays_per_frame = primary * shadow_mult
    out = {
        "ms_per_frame": ms,
        "fps": 1e3 / ms if ms > 0 else float("inf"),
        "mrays_per_s": rays_per_frame / (ms / 1e3) / 1e6,
        "mrays_per_s_primary": primary / (ms / 1e3) / 1e6,
        "frames": n_frames,
        "reps": reps,
        "all_times_ms": [t / n_frames * 1e3 for t in times],
    }
    if config.shadows:
        out["shadow_rays_per_frame"] = int(primary * (shadow_mult - 1.0))
    return out
