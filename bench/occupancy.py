#!/usr/bin/env python
"""Occupancy-distribution analysis for the 2D slab grid (the useful-lane
question).

BASELINE.md's roofline says the 2D force kernel is VPU-instruction-bound and
the remaining headroom is sentinel lanes: alive^2 / cap^2 of evaluated
slab-pair lanes are real pairs (~21% at mean occupancy 5 / capacity 11).
Every candidate fix (per-block dynamic slot bounds, two-tier capacity,
rebin-time compaction) reduces to the same question: over the bins a Mosaic
block processes TOGETHER (vector lanes cannot skip individual bins), how far
below the global capacity is the BLOCK-max occupancy? If E[max over a
block] ~ cap for realistic block sizes, slot-plane skipping cannot win.

This script measures exactly that from the real initial distribution (which
is statistically stationary — the dynamics are density-preserving):
occupancy histogram, block-max distribution for candidate block shapes, and
the implied lane-saving bound. Pure numpy; no engine machinery.

Usage: python bench/occupancy.py -n 4194304 [--scale 5.0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=4_194_304)
    ap.add_argument("--scale", type=float, default=5.0, help="grid_bin_scale")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--steps", type=int, default=0,
                    help="evolve this many steps first (the initial lattice "
                         "is structured; steady state is the honest sample)")
    args = ap.parse_args(argv)

    from ppsim_tpu.config import SimConfig
    from ppsim_tpu.initlib import init_particles

    cfg = SimConfig(num_parts=args.n, grid_bin_scale=args.scale)
    state = init_particles(cfg, seed=args.seed, method="fast")
    if args.steps:
        from ppsim_tpu.engines import get_engine

        eng = get_engine("pallas", cfg)
        res = eng.run(state, nsteps=args.steps)
        state = res.state
    pos = np.asarray(state.pos)
    bs = cfg.grid_bin_size
    nb = cfg.grid_bins_per_side
    r = np.clip((pos[:, 0] / bs).astype(np.int64), 0, nb - 1)
    c = np.clip((pos[:, 1] / bs).astype(np.int64), 0, nb - 1)
    occ = np.bincount(r * nb + c, minlength=nb * nb).reshape(nb, nb)

    mean = occ.mean()
    hist = np.bincount(occ.reshape(-1))
    cap = int(occ.max())

    # Block-max distribution for candidate Mosaic block shapes. The current
    # kernel processes (8 rows x full cols); smaller lane tiles would need a
    # 2-D grid split.
    out = {
        "n": args.n,
        "grid": [nb, nb],
        "mean_occ": round(float(mean), 3),
        "global_max": cap,
        "occ_hist": {str(i): int(h) for i, h in enumerate(hist) if h},
        "block_max": {},
    }
    for br, bc in ((8, nb), (8, 512), (8, 128), (8, 8), (1, 1)):
        rr = nb // br * br
        cc = nb // bc * bc
        blocks = occ[:rr, :cc].reshape(rr // br, br, cc // bc, bc)
        bmax = blocks.max(axis=(1, 3))
        # lanes if each block ran only to its own max (triangle + 4 dirs),
        # relative to running every block at the global cap
        def lanes(k):
            return k * (k - 1) / 2 + 4 * k * k

        save = float(np.mean(lanes(bmax)) / lanes(cap))
        out["block_max"][f"{br}x{bc}"] = {
            "mean_max": round(float(bmax.mean()), 2),
            "p99_max": int(np.percentile(bmax, 99)),
            "lane_fraction_vs_cap": round(save, 3),
        }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
