#!/usr/bin/env python
"""Figure: LJ running-max bin occupancy vs step (ab:lj_occupancy_curve rows).

The r4 finding this plots: LJ condensation demand CLIPS any compilable slot
capacity (the curves flatten exactly at each run's probe capacity, not
below it), so capacity is a deferral-pressure knob, not a container bound —
see BASELINE.md "r4 occupancy-growth curves". Regenerate after new probe
runs: `python bench/plot_occupancy.py` -> bench/lj-occupancy.png.
"""

from __future__ import annotations

import argparse
import json
import sys

# Categorical slots 1..n of the validated reference palette (fixed
# assignment order, light mode), text/grid in ink tokens — never the
# series hues.
SERIES = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100"]
INK = "#0b0b0b"
INK2 = "#52514e"
SURFACE = "#fcfcfb"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("results", nargs="?", default="bench/results_tpu3d.jsonl")
    ap.add_argument("--out", default="bench/lj-occupancy.png")
    args = ap.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = []
    with open(args.results) as f:
        for line in f:
            if not line.strip():
                continue
            r = json.loads(line)
            if r.get("ab") == "lj_occupancy_curve" and "curve" in r:
                rows.append(r)
    if not rows:
        print("no ab:lj_occupancy_curve rows in", args.results)
        return 1
    # Latest row per problem size wins (re-measured probes supersede).
    latest = {}
    for r in rows:
        latest[r["num_parts"]] = r

    fig, ax = plt.subplots(figsize=(6, 4.5), facecolor=SURFACE)
    ax.set_facecolor(SURFACE)
    for i, (n, r) in enumerate(sorted(latest.items())):
        color = SERIES[i % len(SERIES)]
        steps = [p["step"] for p in r["curve"]]
        occ = [p["max_bin_count"] for p in r["curve"]]
        cap = r["probe_capacity"]
        label = f"n={n:,} (probe cap {cap})"
        ax.plot(steps, occ, "-", lw=2, color=color, label=label)
        ax.axhline(cap, color=color, lw=1, ls=":", alpha=0.55)
        # Direct label at the clip plateau (selective: one per series).
        ax.annotate(f"clips at {occ[-1]}", (steps[-1], occ[-1]),
                    textcoords="offset points", xytext=(-4, 6),
                    ha="right", fontsize=8, color=INK2)
        ax.annotate(f"mean occ {r['mean_occupancy']:.1f}", (steps[0], occ[0]),
                    textcoords="offset points", xytext=(4, -12),
                    ha="left", fontsize=8, color=INK2)
    ax.set_xlabel("step", color=INK)
    ax.set_ylabel("running max bin occupancy", color=INK)
    ax.set_title("3D Lennard-Jones: pocket occupancy demand clips the probe\n"
                 "capacity (capacity bounds deferral pressure, not demand)",
                 fontsize=10, color=INK)
    ax.tick_params(colors=INK2)
    ax.grid(True, lw=0.5, alpha=0.25)
    for s in ax.spines.values():
        s.set_color(INK2)
        s.set_alpha(0.4)
    ax.legend(loc="lower right", fontsize=8)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120, facecolor=SURFACE)
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
