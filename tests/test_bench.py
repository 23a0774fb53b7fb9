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


def test_runner_out_file_persists_row(tmp_path):
    """--out persistence: the row must be on disk the moment timing lands,
    so bench.py's per-config deadline can never lose a measurement
    (VERDICT r3 next #2c)."""
    out = tmp_path / "row.json"
    row = run_bench("B1", frames=2, scale=0.125, reps=1,
                    out_path=str(out))
    on_disk = json.loads(out.read_text())
    assert on_disk["config"] == "B1"
    assert on_disk["ms_per_frame"] == pytest.approx(row["ms_per_frame"])


def test_floor_metrics_small_scene():
    """Floor metrics (VERDICT r3 next #3): lane-steps measured by the
    march debug counters, with the derived architectural-floor numbers."""
    from hmrt_tpu.api.scene import make_scene
    from hmrt_tpu.bench.floor import floor_metrics
    from hmrt_tpu.config import RenderConfig
    from hmrt_tpu.io.heightmap import procedural_terrain
    from hmrt_tpu.types import Camera

    terr = procedural_terrain(128, seed=3)
    scene = make_scene(terr)
    cam = Camera.create(eye=(64, -42, float(terr.max()) + 21),
                        target=(64, 64, float(terr.mean())))
    cfg = RenderConfig(width=128, height=32, shading="phong", shadows=True)
    m = floor_metrics(scene, cam, cfg, measured_ms=100.0)
    assert m["lane_steps_per_frame"] > 0
    assert (m["lane_steps_per_frame"]
            == m["lane_steps_primary"] + m["lane_steps_shadow"])
    assert m["lane_steps_shadow"] > 0  # shadows marched
    assert m["x_architectural_floor"] > 0
    assert m["vec_ops_per_lane_step"] > 0
    json.dumps(m)


def test_bench_cli_emit_schema():
    """bench.py's emitted line schema: metric/value/unit/vs_baseline, and
    the CPU-fallback B3 metric name is unmistakably not a hardware row."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "bench_main", os.path.join(os.path.dirname(__file__), "..",
                                   "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    row = {"ms_per_frame": 2000.0}
    line = mod.emit("B3", row)
    assert line["metric"].endswith("_1chip")
    assert line["vs_baseline"] == pytest.approx(125.0)
    line = mod.emit("B3", row, fallback=True)
    assert "CPU_FALLBACK_NOT_HARDWARE" in line["metric"]
    line = mod.emit("B2", row)
    assert line["metric"] == "ms_per_frame_B2"
