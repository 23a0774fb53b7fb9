"""Benchmark runner: executes the B1-B5 configs and emits metric rows
matching BASELINE.json:2's schema (SURVEY.md section 5, observability)."""

from __future__ import annotations

import dataclasses
import json
import os
import time

import jax

from hmrt_tpu.api.flythrough import orbit_flythrough
from hmrt_tpu.bench.configs import BENCH_CONFIGS, BenchConfig, bench_scene
from hmrt_tpu.bench.timing import time_animation
from hmrt_tpu.types import Camera


def _write_row(out_path, row):
    """Incremental row persistence: the orchestrator (bench.py) kills a
    config subprocess at its deadline, so everything measured so far must
    already be on disk (VERDICT r3 next #2c)."""
    if not out_path:
        return
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(row, f)
    import os
    os.replace(tmp, out_path)


def run_bench(name: str, frames: int | None = None, scale: float = 1.0,
              reps: int = 3, frame_sharded: bool = False,
              floor: bool = False, out_path: str | None = None) -> dict:
    """Run one named benchmark config; returns a metric row dict.

    `scale` < 1 shrinks the framebuffer (CI smoke mode, SURVEY.md 4.5).
    `frame_sharded`: for animated configs on a multi-chip mesh, shard the
    FRAME axis (distrib.mesh.render_flythrough_sharded) instead of timing
    single-chip — the natural B4 scaling strategy.
    `floor`: additionally measure lane-steps/frame with the march debug
    counters and emit the architectural-floor metrics (bench/floor.py);
    intended for B3.
    `out_path`: write the row JSON to this file as soon as timing lands
    (and again after floor enrichment), so a caller-imposed deadline
    never loses the measurement.
    """
    cfg = BENCH_CONFIGS[name]
    render = cfg.render
    if scale != 1.0:
        render = dataclasses.replace(
            render,
            width=max(64, int(render.width * scale) // 64 * 64),
            height=max(64, int(render.height * scale) // 64 * 64),
        )
    n_frames = frames or cfg.frames
    frame_sharded = (cfg.animated and frame_sharded
                     and len(jax.devices()) > 1)
    if frame_sharded:
        # the frame axis must divide the mesh: round the count to it
        ndev = len(jax.devices())
        n_frames = max(ndev, n_frames // ndev * ndev)

    t_setup = time.perf_counter()
    scene, cam, terr = bench_scene(cfg)
    zmax = float(terr.max())
    setup_s = time.perf_counter() - t_setup

    if cfg.animated:
        cams = orbit_flythrough(cfg.map_n, zmax, n_frames)
    else:
        # static camera repeated (per-rep salt still varies the dispatch)
        cams = Camera(
            eye=jax.numpy.broadcast_to(cam.eye, (n_frames, 3)),
            target=jax.numpy.broadcast_to(cam.target, (n_frames, 3)),
            up=jax.numpy.broadcast_to(cam.up, (n_frames, 3)),
            fov_y=jax.numpy.broadcast_to(cam.fov_y, (n_frames,)),
        )

    # hit fraction from one real frame (shadow rays exist only for hit
    # pixels — this keeps the Mrays/s metric honest on sky-heavy views)
    hit_frac = None
    if render.shadows:
        import numpy as np
        from hmrt_tpu.core.renderer import render_frame
        fr = render_frame(scene, cam, render)
        hit_frac = float(np.asarray(fr.hit).mean())

    note = None
    strategy = None
    if frame_sharded:
        from hmrt_tpu.distrib.mesh import make_mesh, replicate_scene
        from hmrt_tpu.distrib.bench import time_flythrough_frames
        mesh = make_mesh(axis_name="frames")
        scene = replicate_scene(scene, mesh)
        stats = time_flythrough_frames(scene, cams, render, n_frames,
                                       mesh, reps=reps, hit_frac=hit_frac)
        chips = len(jax.devices())
        strategy = "frame-dp"
    elif cfg.sharded and len(jax.devices()) > 1:
        from hmrt_tpu.distrib.mesh import make_mesh, replicate_scene
        from hmrt_tpu.distrib.bench import time_animation_sharded
        mesh = make_mesh()
        scene = replicate_scene(scene, mesh)
        stats = time_animation_sharded(scene, cams, render, n_frames,
                                       mesh, reps=reps, hit_frac=hit_frac)
        chips = len(jax.devices())
    else:
        if cfg.sharded:
            note = ("UNSHARDED FALLBACK: config is multi-chip but only one "
                    "device is attached; number below is single-chip")
        stats = time_animation(scene, cams, render, n_frames, reps=reps,
                               hit_frac=hit_frac)
        chips = 1

    row = {
        "config": name,
        "description": cfg.description,
        "resolution": [render.width, render.height],
        "map": cfg.map_n,
        "chips": chips,
        "backend": jax.devices()[0].platform,
        "setup_s": round(setup_s, 2),
        **{k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in stats.items()},
    }
    if hit_frac is not None:
        row["hit_frac"] = round(hit_frac, 4)
    if strategy:
        row["strategy"] = strategy
    if note:
        row["note"] = note
    _write_row(out_path, row)

    # ---- post-row enrichments: run AFTER the main row is persisted so a
    # hang/fault here never costs the measurement (same policy as floor).
    extras = os.environ.get("HMRT_BENCH_EXTRAS", "1") == "1"
    if (extras and name == "B5" and chips == 1 and scale == 1.0
            and jax.devices()[0].platform != "cpu"):
        # VERDICT r4 next #4: the band-sharded code path has CPU-mesh
        # pixel parity but had NO timed run anywhere. Time it on a
        # 1-device mesh (the real chip): same shard_map program — band
        # raygen, band-height compile shapes, all_gather — minus real
        # ICI, so sharding OVERHEAD becomes driver-visible. Plus a
        # per-band row (H/8-height compact render with the row0 shift)
        # bounding per-chip time under true 8-way sharding.
        import numpy as _np
        import jax.numpy as jnp
        try:
            from hmrt_tpu.distrib.mesh import (make_mesh,
                                               render_frame_sharded,
                                               replicate_scene)
            mesh = make_mesh()
            scene_r = replicate_scene(scene, mesh)

            def one_sharded(salt):
                cam2 = Camera(eye=cam.eye + salt, target=cam.target,
                              up=cam.up, fov_y=cam.fov_y)
                fr = render_frame_sharded(scene_r, cam2, render, mesh)
                return float(jnp.sum(fr.color[::16, ::16]))

            one_sharded(jnp.zeros(3, jnp.float32))  # compile
            ts = []
            for rep in range(1, 3):
                salt = jnp.asarray([rep * 1e-4] * 3, jnp.float32)
                t0 = time.perf_counter()
                one_sharded(salt)
                ts.append((time.perf_counter() - t0) * 1e3)
            row["sharded_mesh1_ms"] = round(min(ts), 1)
            row["sharded_mesh1_note"] = (
                "render_frame_sharded on a 1-device mesh: the real "
                "band-sharded program (shard_map raygen + all_gather) "
                "timed on hardware; compare to ms_per_frame for "
                "sharding overhead")
        except Exception as e:
            row["sharded_mesh1_error"] = f"{type(e).__name__}: {e}"
        _write_row(out_path, row)
        try:
            from hmrt_tpu.kernels.compact import render_frame_compact
            band = render.height // 8
            band_cfg = dataclasses.replace(render, height=band)

            def one_band(salt):
                cam2 = Camera(eye=cam.eye + salt, target=cam.target,
                              up=cam.up, fov_y=cam.fov_y)
                fr = render_frame_compact(
                    scene, scene.packed, cam2, band_cfg,
                    row0=jnp.float32(4 * band),
                    full_height=render.height)
                return float(jnp.sum(fr.color[::16, ::16]))

            one_band(jnp.zeros(3, jnp.float32))  # compile
            ts = []
            for rep in range(1, 4):
                salt = jnp.asarray([rep * 1e-4] * 3, jnp.float32)
                t0 = time.perf_counter()
                one_band(salt)
                ts.append((time.perf_counter() - t0) * 1e3)
            ts.sort()
            row[f"band_h{band}_ms"] = round(ts[len(ts) // 2], 1)
            row[f"band_h{band}_note"] = (
                f"single-chip compact render of one {band}-row band "
                "(row0-shifted raygen): per-chip work bound under "
                "8-way band sharding")
        except Exception as e:
            row["band_row_error"] = f"{type(e).__name__}: {e}"
        _write_row(out_path, row)

    if (extras and name == "B4" and scale == 1.0 and not frame_sharded
            and jax.devices()[0].platform != "cpu"):
        # VERDICT r4 weak #4: B4's driver row is 1280x720 only, while the
        # metric schema (BASELINE.json:2) is defined at 1920x1080 — emit
        # the schema-resolution number next to the 720p row.
        try:
            render_hd = dataclasses.replace(render, width=1920,
                                            height=1080)
            stats_hd = time_animation(scene, cams, render_hd, n_frames,
                                      reps=max(1, reps - 1),
                                      hit_frac=hit_frac)
            row["ms_per_frame_1920x1080"] = stats_hd["ms_per_frame"]
        except Exception as e:
            row["hd_row_error"] = f"{type(e).__name__}: {e}"
        _write_row(out_path, row)

    if floor:
        # enrich AFTER the timing row is persisted: a hang/fault here
        # must not cost the measurement (VERDICT r3 weak #1)
        try:
            from hmrt_tpu.bench.floor import floor_metrics
            row.update(floor_metrics(scene, cam, render,
                                     measured_ms=row.get("ms_per_frame")))
        except Exception as e:  # diagnostic only — never sink the row
            row["floor_error"] = f"{type(e).__name__}: {e}"
        _write_row(out_path, row)
    return row


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(description="hmrt_tpu benchmarks (B1-B5)")
    p.add_argument("configs", nargs="*", default=["B1", "B2", "B3"],
                   help="which configs to run")
    p.add_argument("--frames", type=int, default=None)
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--frame-sharded", action="store_true",
                   help="shard animated configs over the frame axis "
                        "(multi-chip B4 strategy)")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace here (SURVEY.md sec. 5)")
    p.add_argument("--out", default=None,
                   help="also write each row JSON to this file as soon as "
                        "it is measured (deadline-safe persistence)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (outage fallback; the env "
                        "var alone does not stick under the axon "
                        "sitecustomize — must be set via jax.config)")
    p.add_argument("--floor", action="store_true",
                   help="add lane-step / architectural-floor metrics to "
                        "the row (bench/floor.py; meant for B3)")
    args = p.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from hmrt_tpu.utils.profiling import maybe_trace
    for name in args.configs:
        with maybe_trace(args.profile_dir):
            row = run_bench(name, frames=args.frames, scale=args.scale,
                            reps=args.reps, frame_sharded=args.frame_sharded,
                            floor=args.floor, out_path=args.out)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
