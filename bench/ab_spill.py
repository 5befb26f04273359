#!/usr/bin/env python
"""One-process A/B: init-capacity policy at the 3D stretch scale.

Arm "raise" (the r4 behavior): the t=0 lattice packs one slot past the
chooser capacity, init_carry raises the capacity for the WHOLE run
(grid3_spill=False), lane work scales ~capacity².
Arm "spill" (r5): the overflow is parked one bin over inside the
stale-slack envelope (ops/grid3d_ops.slab3_from_particles_spill) and the
run keeps the chooser capacity.

Both arms run the same auto geometry/cadence on the same initial state in
ONE process (cross-session TPU numbers differ ~2x; in-session they're
stable). Monitors are checked per arm; rows append to the 3D JSONL.

Usage:
    python bench/ab_spill.py -n 20971520 --chunk-steps 200 --repeats 3 \
        --out bench/results_tpu3d.jsonl
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=20_971_520)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--engine", default="pallas3d")
    ap.add_argument("--density", type=float, default=7e-6)
    ap.add_argument("--force-law", default="repulsive")
    ap.add_argument("--chunk-steps", type=int, default=None)
    ap.add_argument("--rebin3-every", type=int, default=None)
    ap.add_argument("--pack-mode", default=None, choices=("sort", "claim"),
                    help="grid_pack_mode (claim = the compile-safe pack for "
                         "the degraded-helper window; recorded in the rows)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from ppsim_tpu.config import SimConfig
    from ppsim_tpu.engines import get_engine
    from ppsim_tpu.harness import timed_run_repeats
    from ppsim_tpu.initlib import init_particles

    base_kw = dict(num_parts=args.n, ndim=3, density=args.density,
                   force_law=args.force_law,
                   rebin3_every=args.rebin3_every)
    if args.pack_mode:
        base_kw["grid_pack_mode"] = args.pack_mode
    base = SimConfig(**base_kw)
    state = init_particles(base, seed=42, method="fast")

    records = []
    for arm, spill in (("raise", False), ("spill", True)):
        cfg = dataclasses.replace(base, grid3_spill=spill)
        engine = get_engine(args.engine, cfg)
        result, times = timed_run_repeats(
            engine, state, args.steps, 0,
            repeats=args.repeats, chunk_steps=args.chunk_steps)
        monitors_ok = True
        try:
            engine.check(result)
        except RuntimeError as e:
            monitors_ok = False
            print(f"# arm {arm}: monitor tripped: {e}", flush=True)
        best = min(times)
        rec = {
            "ab": "init_spill",
            "arm": arm,
            "engine": args.engine,
            "ndim": 3,
            "force_law": args.force_law,
            "num_parts": args.n,
            "nsteps": args.steps,
            "seconds": best,
            "times": [round(t, 4) for t in times],
            "particle_steps_per_sec": args.n * args.steps / best,
            "run_capacity": engine.geom.capacity,
            "spilled_pack": bool(getattr(engine, "_pack_spill", False)),
            "max_bin_count": int(result.monitors.max_bin_count),
            "dropped": int(result.monitors.migrate_dropped),
            "deferred": int(result.monitors.deferred),
            "max_speed": float(result.monitors.max_speed),
            "monitors_ok": monitors_ok,
            "grid_pack_mode": base.grid_pack_mode,
            "chunk_steps": args.chunk_steps,
            "ts": time.time(),
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)

    if args.out:
        with open(args.out, "a") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
    if len(records) == 2:
        print(f"# spill: {records[0]['seconds'] / records[1]['seconds']:.4f}x "
              "vs raise", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
