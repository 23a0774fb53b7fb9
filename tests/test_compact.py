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

# the interpret-mode kernel matrix is the bulk of CI wall time; the same
# paths run compiled (fast) under HMRT_TEST_TPU=1, so the slow marker
# applies only to the interpreted variant (fast gate: -m "not slow")
pytestmark = pytest.mark.slow if INTERPRET else []
# unroll>1 is bit-identical by construction (masked sub-steps) but costs
# ~4x wall time under the Pallas interpreter, so the suite pins 1 there;
# test_compact_unroll_parity covers the unrolled path at small scale.
UNROLL = 1 if INTERPRET else 4


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
                              interpret=INTERPRET, unroll=UNROLL)
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


def test_compact_l0_tail(scene128c):
    """The optional forced-level-0 tail (l0_tail=True; off by default —
    it wins ~1.5% on grazing-tail workloads like B3 but costs 2.2x on
    downward orbit views like B4, BENCH_NOTES.md) stays exact."""
    scene, terr = scene128c
    cam = _cam(terr)
    cfg = RenderConfig(width=128, height=32, shading="phong")
    fc = render_frame_compact(scene, scene.packed, cam, cfg,
                              interpret=INTERPRET, l0_tail=True,
                              unroll=UNROLL)
    fo = render_frame_oracle(scene, cam, cfg)
    np.testing.assert_array_equal(np.asarray(fc.hit), np.asarray(fo.hit))
    assert np.abs(np.asarray(fc.color) - np.asarray(fo.color)).max() < 5e-5


def test_compact_odd_resolution(scene128c):
    scene, terr = scene128c
    fc = render_frame_compact(scene, scene.packed, _cam(terr),
                              RenderConfig(width=100, height=37),
                              interpret=INTERPRET, unroll=UNROLL)
    assert np.asarray(fc.color).shape == (37, 100, 3)


def test_compact_grazing(scene128c):
    scene, terr = scene128c
    n = terr.shape[0]
    cam = Camera.create(eye=(-10.0, n / 2, float(terr.max()) * 0.9),
                        target=(float(n), n / 2 + 1.0,
                                float(terr.max()) * 0.88))
    _compare(scene, terr, RenderConfig(width=256, height=16), cam=cam)


def test_compact_subserve(scene128c):
    """Per-sublane record serving (march_body.subserve_gathers): 8
    independent demand streams per block, one record per sublane, one
    take-scan serving all 8. Serving policy only — hits must match the
    oracle exactly (same cells, same intersector arithmetic)."""
    scene, terr = scene128c
    cam = _cam(terr)
    for cfg in (RenderConfig(width=128, height=32, shading="phong",
                             shadows=True),
                RenderConfig(width=100, height=37)):
        fc = render_frame_compact(scene, scene.packed, cam, cfg,
                                  interpret=INTERPRET, subserve=True,
                                  unroll=UNROLL)
        fo = render_frame_oracle(scene, cam, cfg)
        np.testing.assert_array_equal(np.asarray(fc.hit),
                                      np.asarray(fo.hit))
        assert np.abs(np.asarray(fc.color)
                      - np.asarray(fo.color)).max() < 5e-5


def test_compact_subserve_grazing_l0(scene128c):
    """subserve x l0_tail on a grazing camera — the B3 tail regime the
    mode exists for (horizon rays crossing many columns)."""
    scene, terr = scene128c
    n = 128
    cam = Camera.create(eye=(2.0, n / 2, float(terr.max()) * 1.02),
                        target=(float(n), n / 2 + 1.0,
                                float(terr.max()) * 0.88))
    cfg = RenderConfig(width=256, height=16)
    fc = render_frame_compact(scene, scene.packed, cam, cfg,
                              interpret=INTERPRET, subserve=True,
                              l0_tail=True, unroll=UNROLL)
    fo = render_frame_oracle(scene, cam, cfg)
    np.testing.assert_array_equal(np.asarray(fc.hit), np.asarray(fo.hit))
    assert np.abs(np.asarray(fc.color) - np.asarray(fo.color)).max() < 5e-5


def test_compact_band_tail(scene128c):
    """Band-granular tail serving (band_tail=True: serving key is
    column*8 + 32x4-cell band, each bank DMA is the band's 4 contiguous
    corner rows, gather is one take per channel —
    march_body.band_gathers). Serving policy only; hits must match the
    oracle exactly. Covers both a grazing camera (the regime the mode
    targets) and an oblique one with shadows."""
    scene, terr = scene128c
    n = 128
    graze = Camera.create(eye=(2.0, n / 2, float(terr.max()) * 1.02),
                          target=(float(n), n / 2 + 1.0,
                                  float(terr.max()) * 0.88))
    for bh, (cam, cfg) in [
            (4, (graze, RenderConfig(width=256, height=16))),
            (8, (graze, RenderConfig(width=256, height=16))),
            (8, (_cam(terr),
                 RenderConfig(width=128, height=32, shading="phong",
                              shadows=True))),
            (16, (_cam(terr), RenderConfig(width=128, height=16))),
            # 32 = column key, corner-rows-only DMA (no cascade rows)
            (32, (graze, RenderConfig(width=256, height=16)))]:
        fc = render_frame_compact(scene, scene.packed, cam, cfg,
                                  interpret=INTERPRET, subserve=True,
                                  l0_tail=True, band_tail=bh,
                                  unroll=UNROLL)
        fo = render_frame_oracle(scene, cam, cfg)
        np.testing.assert_array_equal(np.asarray(fc.hit),
                                      np.asarray(fo.hit))
        assert np.abs(np.asarray(fc.color)
                      - np.asarray(fo.color)).max() < 5e-5


def test_compact_adaptive_tail(scene128c):
    """l0_tail='auto' picks the forced-l0 tail kernel per frame via
    lax.cond on the survivors' level mix (kernels/compact.py
    L0_TAIL_AUTO_THRESH). Both branches are exact, so any camera must
    match the oracle; cover a grazing view (selects the l0 branch on
    B3-like work) and an orbit view (selects the plain branch)."""
    scene, terr = scene128c
    n = 128
    graze = Camera.create(eye=(2.0, n / 2, float(terr.max()) * 1.02),
                          target=(float(n), n / 2 + 1.0,
                                  float(terr.max()) * 0.88))
    orbit = Camera.create(eye=(n * 0.8, n * 0.2, float(terr.max()) * 1.6),
                          target=(n / 2, n / 2, float(terr.mean())))
    for cam, cfg in ((graze, RenderConfig(width=256, height=16)),
                     (orbit, RenderConfig(width=128, height=32,
                                          shading="phong", shadows=True))):
        fc = render_frame_compact(scene, scene.packed, cam, cfg,
                                  interpret=INTERPRET, l0_tail="auto",
                                  unroll=UNROLL)
        fo = render_frame_oracle(scene, cam, cfg)
        np.testing.assert_array_equal(np.asarray(fc.hit),
                                      np.asarray(fo.hit))
        assert np.abs(np.asarray(fc.color)
                      - np.asarray(fo.color)).max() < 5e-5


def test_compact_prefix_rounds(scene128c):
    """Prefix-sliced compaction rounds (round_prefixes/shadow_prefixes):
    later rounds sort + march only a static front slice of the alive-
    compacted population; a full-population unbudgeted guard round
    completes anything a prefix missed, so any prefix schedule — however
    badly sized — must be pixel-exact. Covers a grazing camera (tail
    regime), an oblique one with shadows, and deliberately tiny prefixes
    that force the guard round to do real work."""
    scene, terr = scene128c
    n = 128
    graze = Camera.create(eye=(2.0, n / 2, float(terr.max()) * 1.02),
                          target=(float(n), n / 2 + 1.0,
                                  float(terr.max()) * 0.88))
    cases = [
        (graze, RenderConfig(width=256, height=16),
         (0, 4096, 2048), None),
        (_cam(terr), RenderConfig(width=128, height=32, shading="phong",
                                  shadows=True),
         (0, 2048, 1024), (0, 1024)),
        # pathologically small slices: the guard must finish the frame
        (_cam(terr), RenderConfig(width=128, height=32, shadows=True),
         (0, 1024), (0, 1024)),
    ]
    for i, (cam, cfg, prefixes, spref) in enumerate(cases):
        fc = render_frame_compact(scene, scene.packed, cam, cfg,
                                  interpret=INTERPRET, unroll=UNROLL,
                                  l0_tail="auto",
                                  # case 0 also combines the 32x8 band
                                  # tail with prefix slicing
                                  band_tail=8 if i == 0 else 0,
                                  round_prefixes=prefixes,
                                  shadow_prefixes=spref)
        fo = render_frame_oracle(scene, cam, cfg)
        np.testing.assert_array_equal(np.asarray(fc.hit),
                                      np.asarray(fo.hit))
        assert np.abs(np.asarray(fc.color)
                      - np.asarray(fo.color)).max() < 5e-5


def test_compact_sort_dir(scene128c):
    """sort_dir refines every resort key with the ray's xy-direction
    octant (1 = subordinate to the record key, 2 = octant-major) so
    blocks stay record-coherent between resorts. The key only chooses
    who shares a block — any value must be pixel-exact, including when
    combined with band tails and prefix rounds."""
    scene, terr = scene128c
    cases = [
        (RenderConfig(width=256, height=64, shading="phong"),
         dict(sort_dir=1)),
        (RenderConfig(width=128, height=32, shadows=True),
         dict(sort_dir=2, band_tail=8, l0_tail="auto")),
        (RenderConfig(width=128, height=32, shadows=True),
         dict(sort_dir=1, round_prefixes=(0, 2048, 1024),
              shadow_prefixes=(0, 1024))),
    ]
    for cfg, kw in cases:
        fc = render_frame_compact(scene, scene.packed, _cam(terr), cfg,
                                  interpret=INTERPRET, unroll=UNROLL, **kw)
        fo = render_frame_oracle(scene, _cam(terr), cfg)
        np.testing.assert_array_equal(np.asarray(fc.hit),
                                      np.asarray(fo.hit))
        assert np.abs(np.asarray(fc.color)
                      - np.asarray(fo.color)).max() < 5e-5


def test_compact_banks_parity(scene128c):
    """banks>1 carries several independent (8,128) wavefronts per kernel
    instance so their dependency chains interleave on the VPU (the ILP
    lever against the measured latency trap). Each lane's march is
    deterministic and lane-independent, so the image must be
    BIT-identical to banks=1 — on the production subserve/band/prefix
    path and with shadows."""
    scene, terr = scene128c
    cam = _cam(terr)
    cfg = RenderConfig(width=128, height=32, shading="phong", shadows=True)
    f1 = render_frame_compact(scene, scene.packed, cam, cfg,
                              interpret=INTERPRET, unroll=UNROLL, banks=1)
    for banks in (2, 4):
        fb = render_frame_compact(scene, scene.packed, cam, cfg,
                                  interpret=INTERPRET, unroll=UNROLL,
                                  banks=banks)
        np.testing.assert_array_equal(np.asarray(f1.hit),
                                      np.asarray(fb.hit))
        np.testing.assert_array_equal(np.asarray(f1.color),
                                      np.asarray(fb.color))


def test_compact_unroll_parity(scene128c):
    """unroll>1 amortizes the while-loop sync by running several masked
    steps per condition check; act is recomputed each sub-step so the
    image must be BIT-identical to unroll=1 (the production default is
    4 — measured 2619 -> 2250 ms on B3)."""
    scene, terr = scene128c
    cam = _cam(terr)
    cfg = RenderConfig(width=96, height=16, shading="phong")
    f1 = render_frame_compact(scene, scene.packed, cam, cfg,
                              interpret=INTERPRET, unroll=1)
    f4 = render_frame_compact(scene, scene.packed, cam, cfg,
                              interpret=INTERPRET, unroll=4)
    np.testing.assert_array_equal(np.asarray(f1.hit), np.asarray(f4.hit))
    np.testing.assert_array_equal(np.asarray(f1.color),
                                  np.asarray(f4.color))


def test_compact_sort_mode_slim(scene128c):
    """sort_mode=4 (slim fused row gather) merges the state/result
    planes whose values live in disjoint lane states into shared columns
    and rides the perm_tot composition as a pid column. It uses the
    IDENTICAL argsort permutation as mode 0, so images must be
    BIT-identical to mode 0 (stronger than oracle parity), on the plain
    path and on the production prefix/band path — and oracle-exact."""
    scene, terr = scene128c
    cam = _cam(terr)
    cases = [
        (RenderConfig(width=128, height=32, shading="phong", shadows=True,
                      fog=True),
         dict()),
        (RenderConfig(width=128, height=32, shadows=True),
         dict(band_tail=8, l0_tail="auto", sort_dir=1,
              round_prefixes=(0, 2048, 1024), shadow_prefixes=(0, 1024))),
    ]
    for cfg, kw in cases:
        f0 = render_frame_compact(scene, scene.packed, cam, cfg,
                                  interpret=INTERPRET, unroll=UNROLL,
                                  sort_mode=0, **kw)
        f4 = render_frame_compact(scene, scene.packed, cam, cfg,
                                  interpret=INTERPRET, unroll=UNROLL,
                                  sort_mode=4, **kw)
        np.testing.assert_array_equal(np.asarray(f4.hit),
                                      np.asarray(f0.hit))
        np.testing.assert_array_equal(np.asarray(f4.color),
                                      np.asarray(f0.color))
        fo = render_frame_oracle(scene, cam, cfg)
        np.testing.assert_array_equal(np.asarray(f4.hit),
                                      np.asarray(fo.hit))
        assert np.abs(np.asarray(f4.color)
                      - np.asarray(fo.color)).max() < 5e-5


def test_compact_fold_inv(scene128c):
    """fold_inv=True (the folded-inversion experiment, post-mortem #14:
    the march returns round-final order + the composed pid map; one
    final gather restores launch order; shadows scatter straight back)
    must stay oracle-exact. It argsorts differently-ordered planes, so
    equal-key permutations — and hence images — are NOT bit-identical
    to the default flow; the oracle hit mask is the exactness bar."""
    scene, terr = scene128c
    cam = _cam(terr)
    cfg = RenderConfig(width=128, height=32, shading="phong",
                       shadows=True, fog=True)
    ff = render_frame_compact(scene, scene.packed, cam, cfg,
                              interpret=INTERPRET, unroll=UNROLL,
                              fold_inv=True)
    fo = render_frame_oracle(scene, cam, cfg)
    np.testing.assert_array_equal(np.asarray(ff.hit), np.asarray(fo.hit))
    assert np.abs(np.asarray(ff.color)
                  - np.asarray(fo.color)).max() < 5e-5


def test_compact_sort_mode_payload(scene128c):
    """sort_mode=1 replaces argsort + f32 row-matrix gather with one
    lax.sort carrying iota + the state/result planes as payload. The
    permutation may differ from argsort's in equal-key order — pure
    serving policy — so colors/hits must match the oracle exactly, on
    the plain path and on the production prefix/band/sort_dir path."""
    scene, terr = scene128c
    cam = _cam(terr)
    cases = [
        (RenderConfig(width=128, height=32, shading="phong", shadows=True),
         dict()),
        (RenderConfig(width=128, height=32, shadows=True),
         dict(band_tail=8, l0_tail="auto", sort_dir=1,
              round_prefixes=(0, 2048, 1024), shadow_prefixes=(0, 1024))),
    ]
    for cfg, kw in cases:
        fo = render_frame_oracle(scene, cam, cfg)
        fc = render_frame_compact(scene, scene.packed, cam, cfg,
                                  interpret=INTERPRET, unroll=UNROLL,
                                  sort_mode=1, **kw)
        np.testing.assert_array_equal(np.asarray(fc.hit),
                                      np.asarray(fo.hit))
        assert np.abs(np.asarray(fc.color)
                      - np.asarray(fo.color)).max() < 5e-5
