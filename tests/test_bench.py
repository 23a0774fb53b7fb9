"""Benchmark runner smoke tests at reduced resolution (SURVEY.md 4.5)."""

import json

import pytest

from hmrt_tpu.bench.configs import BENCH_CONFIGS, bench_scene
from hmrt_tpu.bench.runner import run_bench


def test_all_five_configs_pinned():
    assert set(BENCH_CONFIGS) == {"B1", "B2", "B3", "B4", "B5"}
    assert BENCH_CONFIGS["B1"].render.traversal == "dda"
    assert BENCH_CONFIGS["B3"].render.shadows
    assert BENCH_CONFIGS["B3"].render.shading == "phong"
    assert BENCH_CONFIGS["B4"].render.texture and BENCH_CONFIGS["B4"].render.fog
    assert BENCH_CONFIGS["B4"].animated
    assert BENCH_CONFIGS["B5"].sharded
    assert BENCH_CONFIGS["B5"].render.resolution == (2160, 3840)


def test_b1_smoke_metric_row():
    row = run_bench("B1", frames=2, scale=0.125, reps=1)
    # schema per BASELINE.json:2 (SURVEY.md section 5 observability)
    for key in ("config", "resolution", "map", "chips", "ms_per_frame",
                "fps", "mrays_per_s", "backend"):
        assert key in row, key
    assert row["config"] == "B1"
    assert row["ms_per_frame"] > 0
    json.dumps(row)  # row is JSON-serializable


def test_bench_scene_textured():
    scene, cam, terr = bench_scene(BENCH_CONFIGS["B4"].__class__(
        name="t", description="", map_n=64,
        render=BENCH_CONFIGS["B4"].render))
    assert scene.albedo is not None
