"""Reference-protocol benchmark sweep under the CURRENT configuration
(r2 verdict item 6): for each scene, run BOTH integrators for --duration
seconds at 1024² (reference: 30 s × 1024², src/tracer.cpp:362-528), write
reference-schema CSVs, and record whether the openness probe's `auto`
choice ties-or-beats the best manual choice. The cross-integrator metric
is samples/s (MRays/s accounting legitimately differs per integrator:
lockstep analytic bound vs stream actual queue populations).

Usage: python scripts/run_protocol.py [--duration 12]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluctus_tpu.core.types import RenderConfig
from fluctus_tpu.render import driver
from fluctus_tpu.render.benchmark import (run_benchmark,
                                          run_benchmark_stream,
                                          write_txt_report)

ASSETS = "/root/reference/assets"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# (name, path, env_map, use_area_light, max_bounces)
SCENES = [
    ("egyptcat", f"{ASSETS}/egyptcat/egyptcat.obj",
     f"{ASSETS}/env_maps/night.hdr", False, 4),
    ("psor-cube", f"{ASSETS}/psor/psor-cube.obj", None, False, 4),
    ("gold_rings", f"{ASSETS}/gold_rings/gold_rings_bark.obj", None,
     False, 4),
    ("teapot", f"{ASSETS}/teapot.ply", f"{ASSETS}/env_maps/night.hdr",
     False, 4),
    # config-3 stand-in (country_kitchen-class: closed textured interior,
    # full BSDF set, 8 bounces; camera+ceiling light restored from the
    # committed data/states entry) — the reference protocol's third scene
    # ships without its .obj (src/tracer.cpp:384-389)
    ("kitchen", f"{REPO}/assets/kitchen_proxy.obj", None, True, 8),
    # conference-class stand-in (large flat indoor, many materials —
    # completes the reference benchmark triple egyptcat + conference +
    # country_kitchen, src/tracer.cpp:384-389; the snapshot ships only
    # conference.mtl). Camera + ceiling light from data/states.
    ("conference", f"{REPO}/assets/conference_proxy.obj", None, True, 6),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=12.0)
    args = ap.parse_args()
    os.makedirs("out", exist_ok=True)

    summary = []
    txt_results = []
    for name, path, env, area, mb in SCENES:
        if not os.path.exists(path):
            print(f"skip {name}: {path} missing")
            continue
        cfg = RenderConfig(width=1024, height=1024, max_bounces=mb,
                           use_env_map=env is not None,
                           use_area_light=area)
        sess = driver.create_session(path, env_map=env, cfg=cfg,
                                     use_sbvh=True,
                                     cache_dir="data/hierarchies",
                                     state_dir="data/states" if area
                                     else None,
                                     auto_frame=not area)
        auto_pick = driver.choose_integrator(sess)
        rows = {}
        for integ, fn in (("lockstep", run_benchmark),
                          ("stream", run_benchmark_stream)):
            r = fn(sess, duration_s=args.duration, scene_name=name,
                   csv_path=f"out/protocol_{name}_{integ}.csv")
            rows[integ] = r
            txt_results.append({**r, "scene": f"{name} [{integ}]"})
            print(f"{name:10s} {integ:8s}: "
                  f"{r['total_mrays_s']:7.2f} MRays/s, "
                  f"{r['samples_mrays_s']*1e6/1e6:6.2f} Msamples/s, "
                  f"{r['samples_per_pixel']:.1f} spp", flush=True)
        winner = max(rows, key=lambda k: rows[k]["samples_mrays_s"])
        vals = [rows[k]["samples_mrays_s"] for k in rows]
        # within 5% the integrators are equal to measurement noise (at
        # 30 s the heavy scenes fit ~1 frame per integrator): either
        # choice is correct
        tie = (max(vals) - min(vals)) <= 0.05 * max(vals)
        ok = tie or auto_pick == winner
        print(f"{name:10s} auto picked {auto_pick}; winner by samples/s: "
              f"{winner}{' (tie)' if tie else ''} -> "
              f"{'OK' if ok else 'MISS'}", flush=True)
        summary.append({
            "scene": name, "auto": auto_pick, "winner": winner,
            "auto_correct": ok,
            "lockstep_mrays_s": round(rows["lockstep"]["total_mrays_s"], 2),
            "stream_mrays_s": round(rows["stream"]["total_mrays_s"], 2),
            "lockstep_msamples_s":
                round(rows["lockstep"]["samples_mrays_s"], 3),
            "stream_msamples_s":
                round(rows["stream"]["samples_mrays_s"], 3),
        })
    with open("out/protocol_summary.json", "w") as f:
        json.dump(summary, f, indent=1)
    # averaged txt report (reference simpleReport, src/tracer.cpp:500-527)
    write_txt_report("out/protocol_summary.txt", txt_results)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
