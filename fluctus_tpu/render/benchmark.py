"""Benchmark harness reproducing the reference measurement protocol
(reference: Tracer::runBenchmark, src/tracer.cpp:362-528): timed rendering
with periodic stat rows, CSV schema `scene;time;primary;extension;shadow;
total;samples`, and averaged summary. MRays/s accounting matches the
reference's queue-length counting: primary = camera rays, extension = all
bounce rays (incl. primary), shadow = NEE rays.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from fluctus_tpu.integrators import lockstep

CSV_HEADER = "scene;time;primary;extension;shadow;total;samples"


def ray_counts_per_sample(cfg, n_pix):
    """Analytic per-sample ray counts for the lockstep integrator (every lane
    runs every bounce; extension rays counted like reference queue sizes)."""
    bounces = cfg.max_bounces + 1
    primary = n_pix
    extension = n_pix * bounces
    n_lights = (1 if cfg.use_env_map else 0) + (1 if cfg.use_area_light else 0)
    shadow = n_pix * bounces * (n_lights if cfg.sample_expl else 0)
    return primary, extension, shadow


def run_benchmark(session, duration_s: float = 30.0, scene_name: str = "",
                  csv_path: str | None = None, spp_per_iter: int = 4):
    """Render repeatedly for `duration_s`, report MRays/s. Returns a dict;
    optionally writes the reference-schema CSV."""
    cfg = session.cfg
    scene, params = session.scene, session.params
    n_pix = cfg.width * cfg.height
    tile = min(cfg.tile_size, n_pix)
    primary_c, ext_c, shadow_c = ray_counts_per_sample(cfg, tile)

    # warm up / compile (fused-spp program). NOTE: block_until_ready can
    # return on an ASYNC ack through the compile relay (measured: a 12 s
    # "run" enqueued thousands of frames); every timed iteration must FETCH
    # a value to close the round trip.
    if spp_per_iter < 4:
        import warnings
        warnings.warn(
            f"run_benchmark: spp_per_iter={spp_per_iter} raised to 4 — "
            "smaller fused-spp programs are dominated by per-call dispatch "
            "overhead and under-report throughput", stacklevel=2)
        spp_per_iter = 4
    idx0 = jnp.arange(tile, dtype=jnp.uint32)
    np.asarray(lockstep._render_tile_spp(scene, params, cfg, idx0,
                                         jnp.uint32(0), spp_per_iter)[0])

    rows = []
    samples_done = 0
    t0 = time.perf_counter()
    t_last = t0
    s = 0
    tiles = [(st, jnp.arange(st, min(st + tile, n_pix), dtype=jnp.uint32))
             for st in range(0, n_pix, tile)]
    while time.perf_counter() - t0 < duration_s:
        for _, idx in tiles:
            np.asarray(lockstep._render_tile_spp(scene, params, cfg, idx,
                                                 jnp.uint32(s),
                                                 spp_per_iter)[0])
            now = time.perf_counter()
            dt = now - t_last
            t_last = now
            frac = idx.shape[0] / tile  # final tile may be smaller
            k = spp_per_iter * frac
            rows.append((scene_name, now - t0, k * primary_c / dt / 1e6,
                         k * ext_c / dt / 1e6, k * shadow_c / dt / 1e6,
                         k * (primary_c + ext_c + shadow_c) / dt / 1e6,
                         spp_per_iter * idx.shape[0] / dt / 1e6))
            samples_done += k * idx.shape[0]
        s += spp_per_iter

    wall = time.perf_counter() - t0
    per_pix_samples = samples_done / n_pix
    primary, ext, shadow = ray_counts_per_sample(cfg, samples_done)
    result = {
        "scene": scene_name,
        "wall_s": wall,
        "samples_per_pixel": per_pix_samples,
        "primary_mrays_s": primary / wall / 1e6,
        "extension_mrays_s": ext / wall / 1e6,
        "shadow_mrays_s": shadow / wall / 1e6,
        "total_mrays_s": (primary + ext + shadow) / wall / 1e6,
        "samples_mrays_s": samples_done / wall / 1e6,
    }
    if csv_path:
        _write_csv(csv_path, rows)
    return result


def _write_csv(csv_path, rows):
    with open(csv_path, "w") as f:
        f.write(CSV_HEADER + "\n")
        for r in rows:
            f.write(f"{r[0]};{r[1]:.2f};{r[2]:.2f};{r[3]:.2f};"
                    f"{r[4]:.2f};{r[5]:.2f};{r[6]:.2f}\n")


def summary_line(result: dict) -> str:
    """The reference's averaged one-line-per-scene report format
    (src/tracer.cpp:503: '%s: %.1fM primary, %.2fM extension, %.2fM
    shadow, %.2fM samples, total: %.2fM rays/s')."""
    return (f"{result['scene']}: "
            f"{result['primary_mrays_s']:.1f}M primary, "
            f"{result['extension_mrays_s']:.2f}M extension, "
            f"{result['shadow_mrays_s']:.2f}M shadow, "
            f"{result['samples_mrays_s']:.2f}M samples, "
            f"total: {result['total_mrays_s']:.2f}M rays/s")


def write_txt_report(txt_path: str, results: list[dict]):
    """Averaged txt report, one summary line per benchmark run
    (reference: simpleReport, src/tracer.cpp:500-527)."""
    with open(txt_path, "w") as f:
        for r in results:
            f.write(summary_line(r) + "\n")


def run_benchmark_stream(session, duration_s: float = 30.0,
                         scene_name: str = "", csv_path: str | None = None,
                         spp_per_frame: int = 4):
    """Reference-comparable benchmark of the streaming wavefront: ray
    counts are the ACTUAL per-segment queue populations reported by the
    renderer's counters (primary = spawns, extension/shadow = live-lane
    sums), matching the reference's wavefront queue-length accounting
    (src/tracer.cpp:333-345) rather than the lockstep analytic model —
    the stream terminates paths early, so it traces far fewer rays per
    sample than the lockstep bound."""
    from fluctus_tpu.integrators import wavefront

    cfg = session.cfg
    n_pix = cfg.width * cfg.height
    # same pool scaling as driver.render (n_pix/16): the old 2^14 cap
    # quadrupled the segment count at 1024² — on the 6.3M-tri brute-path
    # scene each segment pays a full mixed-population traversal, and
    # bigger sorted pools also pack more same-chunk rays per kernel block
    pool = min(cfg.pool_size,
               int(np.clip(n_pix // 16, 1 << 12, 1 << 16)))
    cfg = cfg.replace(pool_size=pool)

    def frame():
        img, counters = wavefront.render_stream(
            session.scene, session.params, cfg, spp_per_frame,
            segments_per_launch=32, deferred=True)
        return np.asarray(counters, np.float64)

    frame()  # compile/warm
    rows = []
    tot = np.zeros(3)
    samples_done = 0
    t0 = time.perf_counter()
    t_last = t0
    while time.perf_counter() - t0 < duration_s:
        c = frame()
        now = time.perf_counter()
        dt = now - t_last
        t_last = now
        spawns, ext, shadow = c
        tot += c
        samples_done += n_pix * spp_per_frame
        rows.append((scene_name, now - t0, spawns / dt / 1e6,
                     ext / dt / 1e6, shadow / dt / 1e6,
                     (spawns + ext + shadow) / dt / 1e6,
                     n_pix * spp_per_frame / dt / 1e6))
    wall = time.perf_counter() - t0
    result = {
        "scene": scene_name,
        "wall_s": wall,
        "samples_per_pixel": samples_done / n_pix,
        "primary_mrays_s": tot[0] / wall / 1e6,
        "extension_mrays_s": tot[1] / wall / 1e6,
        "shadow_mrays_s": tot[2] / wall / 1e6,
        "total_mrays_s": tot.sum() / wall / 1e6,
        "samples_mrays_s": samples_done / wall / 1e6,
    }
    if csv_path:
        _write_csv(csv_path, rows)
    return result
