"""Fused Pallas tile kernel vs the oracle renderer (SURVEY.md section 4.2).

Runs in interpreter mode on CPU (the kernel "sanitizer" per SURVEY.md
section 5); set HMRT_TEST_TPU=1 to exercise the compiled path instead.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret/virtual-mesh renders; fast gate: -m "not slow"

import jax

from hmrt_tpu.api.scene import make_scene
from hmrt_tpu.config import RenderConfig
from hmrt_tpu.core.renderer import render_frame
from hmrt_tpu.io.heightmap import procedural_terrain
from hmrt_tpu.kernels.packing import pack_scene
from hmrt_tpu.kernels.raycast import render_frame_pallas
from hmrt_tpu.types import Camera

INTERPRET = not bool(os.environ.get("HMRT_TEST_TPU"))


@pytest.fixture(scope="module")
def scene128():
    terr = procedural_terrain(128, seed=3)
    return make_scene(terr), terr


@pytest.fixture(scope="module")
def packed128(scene128):
    return pack_scene(scene128[0])


def _cam(terr, eye=None, target=None):
    n = terr.shape[0]
    eye = eye or (n / 2, -n / 3, float(terr.max()) + n / 6)
    target = target or (n / 2, n / 2, float(terr.mean()))
    return Camera.create(eye=eye, target=target)


def _compare(scene, packed, cam, cfg, hit_exact=True, color_tol=5e-5):
    fk = render_frame_pallas(scene, packed, cam, cfg, interpret=INTERPRET)
    fo = render_frame(scene, cam, cfg)
    hk, ho = np.asarray(fk.hit), np.asarray(fo.hit)
    if hit_exact:
        np.testing.assert_array_equal(hk, ho)
    else:
        assert (hk != ho).mean() < 1e-3
    both = hk & ho
    ck, co = np.asarray(fk.color), np.asarray(fo.color)
    assert np.abs(ck - co).max() < color_tol, np.abs(ck - co).max()
    return fk, fo


def test_kernel_matches_oracle_lambert(scene128, packed128):
    scene, terr = scene128
    cfg = RenderConfig(width=256, height=64, shading="lambert")
    _compare(scene, packed128, _cam(terr), cfg)


def test_kernel_matches_oracle_phong_aux(scene128, packed128):
    scene, terr = scene128
    cfg = RenderConfig(width=128, height=32, shading="phong",
                       aux_buffers=True)
    fk, fo = _compare(scene, packed128, _cam(terr), cfg)
    hit = np.asarray(fk.hit)
    dk, do = np.asarray(fk.depth), np.asarray(fo.depth)
    np.testing.assert_allclose(dk[hit], do[hit], rtol=1e-5, atol=1e-4)
    nk, no = np.asarray(fk.normal), np.asarray(fo.normal)
    np.testing.assert_allclose(nk[hit], no[hit], atol=1e-4)


def test_kernel_matches_oracle_shadows(scene128, packed128):
    scene, terr = scene128
    cfg = RenderConfig(width=128, height=32, shading="phong", shadows=True)
    _compare(scene, packed128, _cam(terr), cfg)


def test_kernel_matches_oracle_fog(scene128, packed128):
    scene, terr = scene128
    cfg = RenderConfig(width=128, height=32, fog=True)
    _compare(scene, packed128, _cam(terr), cfg)


def test_kernel_texture(scene128):
    _, terr = scene128
    n = terr.shape[0]
    rng = np.random.default_rng(0)
    albedo = rng.uniform(0.2, 0.9, (n, n, 3)).astype(np.float32)
    sc = make_scene(terr, albedo=albedo)
    packed = pack_scene(sc)
    cfg = RenderConfig(width=128, height=32, texture=True)
    fk = render_frame_pallas(sc, packed, _cam(terr), cfg, interpret=INTERPRET)
    fo = render_frame(sc, _cam(terr), cfg)
    np.testing.assert_array_equal(np.asarray(fk.hit), np.asarray(fo.hit))
    diff = np.abs(np.asarray(fk.color) - np.asarray(fo.color))
    assert diff.max() < 1e-3, diff.max()


def test_kernel_resolution_not_tile_divisible(scene128, packed128):
    scene, terr = scene128
    cfg = RenderConfig(width=100, height=37)   # neither 128- nor 8-divisible
    fk = render_frame_pallas(scene, packed128, _cam(terr), cfg,
                             interpret=INTERPRET)
    fo = render_frame(scene, _cam(terr), cfg)
    assert np.asarray(fk.color).shape == (37, 100, 3)
    np.testing.assert_array_equal(np.asarray(fk.hit), np.asarray(fo.hit))


def test_kernel_camera_under_terrain(scene128, packed128):
    scene, terr = scene128
    n = terr.shape[0]
    cam = Camera.create(eye=(n / 2, n / 2, -5.0), target=(n / 2 + 8, n / 2 + 8, 20.0))
    cfg = RenderConfig(width=128, height=32)
    _compare(scene, packed128, cam, cfg)


def test_kernel_all_sky(scene128, packed128):
    scene, terr = scene128
    n = terr.shape[0]
    cam = Camera.create(eye=(n / 2, n / 2, float(terr.max()) + 10.0),
                        target=(n / 2, n / 2 + 10, float(terr.max()) + 50.0))
    cfg = RenderConfig(width=128, height=32)
    fk = render_frame_pallas(scene, packed128, cam, cfg, interpret=INTERPRET)
    assert not np.asarray(fk.hit).any()


def test_kernel_grazing_rays(scene128, packed128):
    scene, terr = scene128
    n = terr.shape[0]
    # nearly horizontal view across the whole map: long marches, axis-ish rays
    cam = Camera.create(eye=(-10.0, n / 2, float(terr.max()) * 0.9),
                        target=(float(n), n / 2 + 1.0, float(terr.max()) * 0.88))
    cfg = RenderConfig(width=256, height=16)
    _compare(scene, packed128, cam, cfg)


def test_kernel_bilinear_intersector(scene128, packed128):
    scene, terr = scene128
    cfg = RenderConfig(width=128, height=32, cell_intersect="bilinear")
    _compare(scene, packed128, _cam(terr), cfg)
