#!/usr/bin/env python
"""Overlay benchmark CSV runs: total MRays/s vs time per scene
(reference: plot_benchmarks.py at the repo root of harskish/fluctus —
same CSV schema `scene;time;primary;extension;shadow;total;samples`)."""
from __future__ import annotations

import argparse
import csv
import os
from collections import defaultdict


def load_csv(path):
    runs = defaultdict(list)
    with open(path) as f:
        reader = csv.reader(f, delimiter=";")
        header = next(reader)
        for row in reader:
            scene = os.path.basename(row[0])
            runs[scene].append((float(row[1]), float(row[5])))
    return runs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csvs", nargs="+")
    ap.add_argument("-o", "--output", default="benchmarks.png")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(9, 5))
    for path in args.csvs:
        for scene, rows in load_csv(path).items():
            rows.sort()
            ts = [r[0] for r in rows]
            mrays = [r[1] for r in rows]
            ax.plot(ts, mrays, label=f"{os.path.basename(path)}:{scene}")
    ax.set_xlabel("time (s)")
    ax.set_ylabel("total MRays/s")
    ax.legend(fontsize=7)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.output, dpi=120)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
