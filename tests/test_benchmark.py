"""Benchmark harness smoke tests: both accounting modes produce the
reference CSV schema and sane totals (reference: Tracer::runBenchmark,
src/tracer.cpp:362-528)."""
import numpy as np

from fluctus_tpu.core.types import RenderConfig, default_params
from fluctus_tpu.render.benchmark import (CSV_HEADER, run_benchmark,
                                          run_benchmark_stream,
                                          summary_line, write_txt_report)
from fluctus_tpu.render.driver import RenderSession

from helpers import big_quad, diffuse_material, make_host_scene


def _session():
    v0, v1, v2 = big_quad(y=0.0)
    env = np.ones((8, 16, 3), np.float32)
    host = make_host_scene(v0, v1, v2, materials=[diffuse_material()],
                           env_image=env)
    cfg = RenderConfig(width=32, height=32, max_bounces=2, backend="wide",
                       use_area_light=False, tile_size=1 << 10)
    params = default_params(world_radius=np.float32(100.0))
    return RenderSession(host_scene=host, scene=host.to_device(),
                         params=params, cfg=cfg)


def _check(result, csv_path):
    for k in ("primary_mrays_s", "extension_mrays_s", "shadow_mrays_s",
              "total_mrays_s", "samples_mrays_s", "samples_per_pixel"):
        assert k in result
        assert np.isfinite(result[k])
    assert result["total_mrays_s"] > 0
    assert result["samples_per_pixel"] > 0
    lines = open(csv_path).read().splitlines()
    assert lines[0] == CSV_HEADER
    assert len(lines) >= 2
    assert all(len(ln.split(";")) == 7 for ln in lines[1:])


def test_run_benchmark_lockstep(tmp_path):
    sess = _session()
    csv = str(tmp_path / "b.csv")
    result = run_benchmark(sess, duration_s=0.5, scene_name="quad",
                           csv_path=csv)
    _check(result, csv)
    # analytic accounting: extension = (bounces+1) x primary exactly
    ratio = result["extension_mrays_s"] / result["primary_mrays_s"]
    assert abs(ratio - 3.0) < 1e-6


def test_txt_report(tmp_path):
    """Averaged txt matches the reference simpleReport line format
    (src/tracer.cpp:503)."""
    r = {"scene": "egyptcat", "primary_mrays_s": 1.0,
         "extension_mrays_s": 4.2, "shadow_mrays_s": 2.1,
         "samples_mrays_s": 0.5, "total_mrays_s": 7.3}
    line = summary_line(r)
    assert line == ("egyptcat: 1.0M primary, 4.20M extension, "
                    "2.10M shadow, 0.50M samples, total: 7.30M rays/s")
    txt = tmp_path / "report.txt"
    write_txt_report(str(txt), [r, r])
    assert txt.read_text().splitlines() == [line, line]


def test_run_benchmark_stream(tmp_path):
    sess = _session()
    csv = str(tmp_path / "bs.csv")
    result = run_benchmark_stream(sess, duration_s=0.5, scene_name="quad",
                                  csv_path=csv, spp_per_frame=2)
    _check(result, csv)
    # actual queue accounting: extension rays >= spawned paths
    assert result["extension_mrays_s"] >= result["primary_mrays_s"] * 0.99
