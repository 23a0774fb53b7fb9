"""Multi-chip rendering: framebuffer sharding over a device mesh (C27/C28).

The reference is single-GPU/single-process — it has no distributed layer at
all (SURVEY.md section 5 "Distributed communication backend: none"). The
TPU build adds the capability pinned by BASELINE.json:5,11: shard the
framebuffer by screen tile across the mesh with the height pyramid
REPLICATED, render each shard locally, and gather the final image over ICI.

TPU-native design, per the scaling-book recipe: define a 1D Mesh over all
chips, `shard_map` the single-device renderer over row-bands of the screen
(rays are embarrassingly parallel — no ring/pipeline pattern is ever needed
because rays don't interact), and let `jax.lax.all_gather` emit the ICI
collective for final-image assembly. Scene arrays use replicated specs so
XLA keeps one HBM copy per chip with zero per-frame traffic.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hmrt_tpu.config import RenderConfig
from hmrt_tpu.core.renderer import shade_hits
from hmrt_tpu.traversal.march import march_dda, march_maxmip
from hmrt_tpu.types import Camera, Frame, Scene


def make_mesh(devices=None, axis_name: str = "tiles") -> Mesh:
    """1D device mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    import numpy as np
    return Mesh(np.array(devices), (axis_name,))


def replicate_scene(scene: Scene, mesh: Mesh) -> Scene:
    """Pin scene arrays with a replicated sharding on the mesh (one HBM copy
    per chip, no per-frame transfer — BASELINE.json:5 'replicated height
    pyramid')."""
    rep = NamedSharding(mesh, P())
    put = lambda x: jax.device_put(x, rep) if x is not None else None
    return Scene(heights=put(scene.heights), pyr_flat=put(scene.pyr_flat),
                 albedo=put(scene.albedo),
                 light=jax.tree.map(put, scene.light),
                 packed=jax.tree.map(put, scene.packed),
                 n=scene.n, m=scene.m, levels=scene.levels)


def render_frame_sharded(scene: Scene, camera: Camera, config: RenderConfig,
                         mesh: Mesh | None = None,
                         use_pallas: bool | None = None) -> Frame:
    """Multi-chip render (SURVEY.md section 3.6): each chip renders its
    row-band of the screen; the full frame is all-gathered over ICI.

    Pixel-identical to the single-device render (tests/test_sharded.py):
    the per-ray pipeline is the same jitted math, only the raygen index
    range differs per shard.

    use_pallas: None = auto (per-chip kernel when the scene is packed and
    a TPU backend is present — the compact backend for maps >= 1024^2,
    the fused tile kernel below, mirroring the single-chip dispatch —
    else the oracle inside shard_map); True forces a kernel band path
    (interpret mode off-TPU — this is how CI pixel-checks the
    row0-shifted raygen on the virtual CPU mesh).
    """
    if mesh is None:
        mesh = make_mesh()
    ndev = mesh.devices.size
    H, W = config.height, config.width
    if H % ndev != 0:
        raise ValueError(f"height {H} must divide evenly over {ndev} devices")
    if use_pallas is None:
        use_pallas = (config.backend != "oracle" and scene.packed is not None
                      and jax.default_backend() == "tpu")
    use_compact = (use_pallas and scene.packed is not None
                   and (config.backend == "compact"
                        or (config.backend == "auto" and scene.m >= 1024)))
    return _render_sharded_jit(scene, camera, config, mesh,
                               use_pallas=use_pallas,
                               use_compact=use_compact)


def render_flythrough_sharded(scene: Scene, cams: Camera,
                              config: RenderConfig, mesh: Mesh | None = None,
                              use_pallas: bool | None = None) -> jnp.ndarray:
    """Frame-parallel animation rendering (C8 x C27): shard the flythrough's
    FRAME axis over the mesh instead of the framebuffer.

    For a scripted animation (BASELINE.json:10) the frame axis is as
    embarrassingly parallel as the pixel domain, and sharding it is
    strictly cheaper than band-sharding every frame: each chip renders
    whole frames against its replicated scene with ZERO per-frame ICI
    traffic — the only cross-chip movement is assembling the output
    stack, which `out_specs=P("frames")` leaves sharded in HBM until the
    host (or a downstream op) actually consumes it. Per-chip rendering is
    the same single-device dispatch as `core.renderer.render_frame`
    (oracle / fused kernel / compact backend), scanned over the chip's
    local frames in one device program.

    cams: batched Camera (leading frame axis, e.g. from
    `api.flythrough.flythrough`); the frame count must divide the mesh
    size. Returns the color stack, logically (F, H, W, 3), sharded over
    frames. Pixel-identical to rendering each frame on one device
    (tests/test_sharded.py).
    """
    if mesh is None:
        mesh = make_mesh(axis_name="frames")
    ndev = mesh.devices.size
    if cams.eye.ndim != 2:
        raise ValueError("cams must be a batched Camera (leading frame "
                         "axis, e.g. from api.flythrough.flythrough); "
                         f"got eye shape {cams.eye.shape}")
    F = int(cams.eye.shape[0])
    if F % ndev != 0:
        raise ValueError(f"frame count {F} must divide evenly over "
                         f"{ndev} devices")
    if use_pallas is None:
        use_pallas = (config.backend != "oracle" and scene.packed is not None
                      and jax.default_backend() == "tpu")
    use_compact = (use_pallas and scene.packed is not None
                   and (config.backend == "compact"
                        or (config.backend == "auto" and scene.m >= 1024)))
    return _render_fly_jit(scene, cams, config, mesh,
                           use_pallas=use_pallas, use_compact=use_compact)


@partial(jax.jit, static_argnames=("config", "mesh", "use_pallas",
                                   "use_compact"))
def _render_fly_jit(scene: Scene, cams: Camera, config: RenderConfig,
                    mesh: Mesh, use_pallas: bool = False,
                    use_compact: bool = False) -> jnp.ndarray:
    axis = mesh.axis_names[0]
    interpret = jax.default_backend() != "tpu"

    def render_one(scene_rep, cam):
        if use_compact:
            from hmrt_tpu.kernels.compact import render_frame_compact
            return render_frame_compact(
                scene_rep, scene_rep.packed, cam, config,
                interpret=interpret,
                # see render_frame_sharded: unroll is bit-identical but
                # ~4x slower under the CI interpreter
                unroll=1 if interpret else 8).color
        if use_pallas:
            from hmrt_tpu.kernels.raycast import render_frame_pallas
            return render_frame_pallas(scene_rep, scene_rep.packed, cam,
                                       config, interpret=interpret).color
        from hmrt_tpu.core.renderer import render_frame_oracle
        return render_frame_oracle(scene_rep, cam, config).color

    def chip(scene_rep, cams_local):
        # one device program per chip: scan over its local frames
        # (scan-of-pallas passes the full-scale retest on jax 0.9.0 —
        # tools/repros/scan_of_compact_fullscale.py; bench/timing.py
        # made it the default again)
        def step(carry, cam):
            return carry, render_one(scene_rep, cam)
        _, colors = jax.lax.scan(step, jnp.float32(0.0), cams_local)
        return colors

    fn = shard_map(chip, mesh=mesh, in_specs=(P(), P(axis)),
                   out_specs=P(axis), check_vma=False)
    return fn(scene, cams)


@partial(jax.jit, static_argnames=("config", "mesh", "use_pallas",
                                   "use_compact"))
def _render_sharded_jit(scene: Scene, camera: Camera, config: RenderConfig,
                        mesh: Mesh, use_pallas: bool = False,
                        use_compact: bool = False) -> Frame:
    H, W = config.height, config.width
    ndev = mesh.devices.size
    band = H // ndev

    if use_compact:
        # compact backend per chip: the sort + march passes + shade are
        # shard-local ops (argsort/pallas on the band's rays only), so
        # shard_map composes directly; only raygen needs the row0 shift.
        from hmrt_tpu.kernels.compact import render_frame_compact
        band_cfg = dataclasses.replace(config, height=band)
        interpret = jax.default_backend() != "tpu"

        def render_band_c(scene_rep, cam):
            row0 = jax.lax.axis_index("tiles") * band
            fr = render_frame_compact(scene_rep, scene_rep.packed, cam,
                                      band_cfg,
                                      row0=row0.astype(jnp.float32),
                                      full_height=H, interpret=interpret,
                                      # unroll is bit-identical (masked
                                      # sub-steps) but ~4x slower under the
                                      # interpreter — CI pins 1, hardware
                                      # keeps the measured-fastest default
                                      unroll=1 if interpret else 8)
            out = (fr.color,
                   fr.depth if fr.depth is not None
                   else jnp.zeros((band, W), jnp.float32),
                   fr.normal if fr.normal is not None
                   else jnp.zeros((band, W, 3), jnp.float32),
                   fr.hit)
            return jax.tree.map(
                lambda x: jax.lax.all_gather(x, "tiles", axis=0, tiled=True),
                out)

        fn = shard_map(render_band_c, mesh=mesh, in_specs=(P(), P()),
                       out_specs=P(), check_vma=False)
        color, depth, normal, hit = fn(scene, camera)
        return Frame(color=color,
                     depth=depth if config.aux_buffers else None,
                     normal=normal if config.aux_buffers else None,
                     hit=hit)

    if use_pallas:
        # each chip runs the fused tile kernel on its row band, with raygen
        # shifted into the full screen's NDC space (kernels/raycast.py);
        # the kernel pads any band height to tile multiples internally and
        # crops, so band does not need to divide the tile height
        from hmrt_tpu.kernels.raycast import render_frame_pallas
        band_cfg = dataclasses.replace(config, height=band)
        interpret = jax.default_backend() != "tpu"

        def render_band_k(scene_rep, cam):
            row0 = jax.lax.axis_index("tiles") * band
            fr = render_frame_pallas(scene_rep, scene_rep.packed, cam,
                                     band_cfg, row0=row0.astype(jnp.float32),
                                     full_height=H, interpret=interpret)
            out = (fr.color,
                   fr.depth if fr.depth is not None
                   else jnp.zeros((band, W), jnp.float32),
                   fr.normal if fr.normal is not None
                   else jnp.zeros((band, W, 3), jnp.float32),
                   fr.hit)
            return jax.tree.map(
                lambda x: jax.lax.all_gather(x, "tiles", axis=0, tiled=True),
                out)

        fn = shard_map(render_band_k, mesh=mesh, in_specs=(P(), P()),
                       out_specs=P(), check_vma=False)
        color, depth, normal, hit = fn(scene, camera)
        return Frame(color=color,
                     depth=depth if config.aux_buffers else None,
                     normal=normal if config.aux_buffers else None,
                     hit=hit)

    # one full-screen ray grid, sharded by row-band; scene+camera replicated
    eye, dirs = camera.rays(H, W)

    def render_band(dirs_band, scene_rep):
        d = dirs_band.reshape(-1, 3)
        dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
        Pn = dx.shape[0]
        ox = jnp.broadcast_to(eye[0], (Pn,))
        oy = jnp.broadcast_to(eye[1], (Pn,))
        oz = jnp.broadcast_to(eye[2], (Pn,))
        heights_flat = scene_rep.heights.reshape(-1)
        max_steps = config.steps_for(scene_rep.n_cells)
        if config.traversal == "dda":
            res = march_dda(ox, oy, oz, dx, dy, dz, heights_flat,
                            n=scene_rep.n, max_steps=max_steps,
                            cell_intersect=config.cell_intersect)
        else:
            res = march_maxmip(ox, oy, oz, dx, dy, dz, scene_rep.pyr_flat,
                               heights_flat, n=scene_rep.n, m=scene_rep.m,
                               levels=scene_rep.levels, max_steps=max_steps,
                               cell_intersect=config.cell_intersect)
        color, depth, normal = shade_hits(scene_rep, config, ox, oy, oz,
                                          dx, dy, dz, res.hit, res.t)
        out = (color.reshape(band, W, 3),
               depth.reshape(band, W),
               normal.reshape(band, W, 3),
               res.hit.reshape(band, W))
        # gather the full framebuffer over ICI (BASELINE.json:5)
        return jax.tree.map(
            lambda x: jax.lax.all_gather(x, "tiles", axis=0, tiled=True), out)

    fn = shard_map(
        render_band, mesh=mesh,
        in_specs=(P("tiles", None, None), P()),
        out_specs=P(),
        # march loop carries start replicated (zeros) and become varying
        # per-shard; skip the varying-manual-axes check rather than pvary
        # every carry leaf inside the generic march code
        check_vma=False,
    )
    color, depth, normal, hit = fn(dirs, scene)
    return Frame(color=color,
                 depth=depth if config.aux_buffers else None,
                 normal=normal if config.aux_buffers else None,
                 hit=hit)
