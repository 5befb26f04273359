#!/usr/bin/env python
"""One-process A/B of the capacity-phase repack at the 3D stretch scale.

r4 verdict #1: at n=20.97M the t=0 shuffled lattice packs 12 into one bin
while the chooser's measured-safe RUN capacity is 11, and lane work scales
~capacity^2 — the whole-run raise was a 22% throughput regression (175.6M
p-s/s vs 224.4M at 16.8M). The repack machinery (Grid3DEngine.repack_plan /
attempt_repack, harness._timed_run_phased) runs a short prologue at the
packing capacity and drops to the run capacity once the lattice disperses,
verified loss-free by the repack packer's overflow scalar.

This A/B times both arms back-to-back in ONE process (cross-session TPU
numbers differ ~2x; in-session ones are stable — CLAUDE.md):

    arm "off": --grid3-repack 0  — whole run at the packing capacity
               (the shipped r4 behavior, the 175.6M row);
    arm "on":  --grid3-repack 1  — prologue + verified repack (r5).

Each record carries the measured packing capacity, the run capacity after
the A/B, and the discovered switch step (engine._last_repack_switch), so
the "disperses within ~40 steps" claim in grid3d.py:_REPACK_MIN_STEPS is
measured, not asserted.

Usage:
    python bench/ab_repack.py                    # 20.97M, chunk 200, x3
    python bench/ab_repack.py -n 16777216 --out bench/results_tpu3d.jsonl
"""

import argparse
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
    ap.add_argument("--chunk-steps", type=int, default=200)
    ap.add_argument("--density", type=float, default=7e-6)
    ap.add_argument("--force-law", default="repulsive")
    ap.add_argument("--arms", default="off,on")
    ap.add_argument("--prologue-steps", type=int, default=None)
    ap.add_argument("--out", default=None, help="append JSONL records here")
    args = ap.parse_args(argv)

    from ppsim_tpu.config import SimConfig
    from ppsim_tpu.engines import get_engine
    from ppsim_tpu.harness import timed_run_repeats
    from ppsim_tpu.initlib import init_particles

    records = []
    for arm in args.arms.split(","):
        extra = {}
        if args.prologue_steps is not None:
            extra["grid3_prologue_steps"] = args.prologue_steps
        config = SimConfig(num_parts=args.n, ndim=3, density=args.density,
                           force_law=args.force_law,
                           grid3_repack=(arm == "on"), **extra)
        state = init_particles(config, seed=42, method="fast")
        engine = get_engine(args.engine, config)
        result, times = timed_run_repeats(
            engine, state, args.steps, 0,
            repeats=args.repeats, chunk_steps=args.chunk_steps,
        )
        monitors_ok = True
        try:
            engine.check(result)
        except RuntimeError as e:
            monitors_ok = False
            print(f"# arm {arm}: monitor tripped: {e}", flush=True)
        best = min(times)
        rec = {
            "ab": "capacity_repack",
            "arm": arm,
            "engine": args.engine,
            "ndim": 3,
            "force_law": args.force_law,
            "num_parts": args.n,
            "nsteps": args.steps,
            "seconds": best,
            "times": [round(t, 4) for t in times],
            "particle_steps_per_sec": args.n * args.steps / best,
            "pack_capacity": int(engine._pack_capacity),
            "run_capacity": int(engine.geom.capacity),
            "repack_switch_step": getattr(engine, "_last_repack_switch",
                                          None),
            "max_bin_count": int(result.monitors.max_bin_count),
            "dropped": int(result.monitors.migrate_dropped),
            "deferred": int(result.monitors.deferred),
            "max_speed": float(result.monitors.max_speed),
            "monitors_ok": monitors_ok,
            "chunk_steps": args.chunk_steps,
            "ts": time.time(),
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)

    if args.out:
        with open(args.out, "a") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
    if len(records) >= 2:
        base = records[0]["seconds"]
        for r in records[1:]:
            print(f"# arm {r['arm']}: {base / r['seconds']:.4f}x vs arm "
                  f"{records[0]['arm']}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
