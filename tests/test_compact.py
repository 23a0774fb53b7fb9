"""Compacted-wavefront renderer vs the oracle (kernels/compact.py)."""

import os

import numpy as np
import pytest

from hmrt_tpu.api.scene import make_scene
from hmrt_tpu.config import RenderConfig
from hmrt_tpu.core.renderer import render_frame_oracle
from hmrt_tpu.io.heightmap import procedural_terrain
from hmrt_tpu.kernels.compact import render_frame_compact
from hmrt_tpu.types import Camera

INTERPRET = not bool(os.environ.get("HMRT_TEST_TPU"))


@pytest.fixture(scope="module")
def scene128c():
    terr = procedural_terrain(128, seed=3)
    return make_scene(terr), terr


def _cam(terr):
    n = terr.shape[0]
    return Camera.create(eye=(n / 2, -n / 3, float(terr.max()) + n / 6),
                         target=(n / 2, n / 2, float(terr.mean())))


def _compare(scene, terr, cfg, cam=None):
    cam = cam or _cam(terr)
    fc = render_frame_compact(scene, scene.packed, cam, cfg,
                              interpret=INTERPRET)
    fo = render_frame_oracle(scene, cam, cfg)
    np.testing.assert_array_equal(np.asarray(fc.hit), np.asarray(fo.hit))
    diff = np.abs(np.asarray(fc.color) - np.asarray(fo.color)).max()
    assert diff < 5e-5, diff
    return fc, fo


def test_compact_matches_oracle(scene128c):
    scene, terr = scene128c
    _compare(scene, terr, RenderConfig(width=256, height=64, shading="phong"))


def test_compact_shadows(scene128c):
    scene, terr = scene128c
    _compare(scene, terr, RenderConfig(width=128, height=32, shading="phong",
                                       shadows=True))


def test_compact_aux_and_fog(scene128c):
    scene, terr = scene128c
    cfg = RenderConfig(width=128, height=32, fog=True, aux_buffers=True)
    fc, fo = _compare(scene, terr, cfg)
    hit = np.asarray(fc.hit)
    np.testing.assert_allclose(np.asarray(fc.depth)[hit],
                               np.asarray(fo.depth)[hit], rtol=1e-5,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(fc.normal)[hit],
                               np.asarray(fo.normal)[hit], atol=1e-4)


def test_compact_texture(scene128c):
    _, terr = scene128c
    n = terr.shape[0]
    rng = np.random.default_rng(0)
    albedo = rng.uniform(0.2, 0.9, (n, n, 3)).astype(np.float32)
    sc = make_scene(terr, albedo=albedo)
    _compare(sc, terr, RenderConfig(width=128, height=32, texture=True))


def test_compact_odd_resolution(scene128c):
    scene, terr = scene128c
    fc = render_frame_compact(scene, scene.packed, _cam(terr),
                              RenderConfig(width=100, height=37),
                              interpret=INTERPRET)
    assert np.asarray(fc.color).shape == (37, 100, 3)


def test_compact_grazing(scene128c):
    scene, terr = scene128c
    n = terr.shape[0]
    cam = Camera.create(eye=(-10.0, n / 2, float(terr.max()) * 0.9),
                        target=(float(n), n / 2 + 1.0,
                                float(terr.max()) * 0.88))
    _compare(scene, terr, RenderConfig(width=256, height=16), cam=cam)
