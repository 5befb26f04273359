#!/usr/bin/env python
"""One-process A/B: 3D Lennard-Jones slot capacity at the stretch scale.

The r3 verdict's LJ finding: the 20.97M LJ row (135.0M p-s/s) was run at a
hand-passed ``--grid3-capacity 12`` while LJ's attractive tail clusters
pockets to occupancy 13 — i.e. the run finishes under standing deferral
pressure (hot bins rebin late every cadence). Round 4 made the engine
choose capacity itself: ``Grid3DEngine.init_carry`` measures the initial
lattice packing exactly and raises capacity to packing + a law-keyed
run-tail margin (LJ: +1, repulsive: +0 — the measured tail behavior in
bench/results_tpu3d.jsonl). At 20.97M LJ that choice is 13, which trades
the deferral pressure for ~8% more slot lanes AND the speed-plane VMEM
fallback (cap 13 > SPEED_PLANE_CAP_MAX = 12: the in-kernel max-speed plane
overflows Mosaic's 128MB scoped VMEM, so max|v| is computed outside the
kernel). Which side wins is an empirical question — this script times both
back-to-back in ONE process (cross-session relay throughput varies ~2x).

Variants: the r3 hand config (cap 12, control) vs the auto choice
(default capacity; init_carry raises it to packing+1). Prints one JSON
line per variant; failed gates are recorded like the reference's failed
ablations (part3 PDF Table 2).

Usage:
    python bench/ab_ljcap.py --out bench/results_tpu3d.jsonl
    python bench/ab_ljcap.py -n 4194304 --chunk-steps 40 --repeats 3
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_variant(args, cap, label: str):
    from ppsim_tpu.config import SimConfig
    from ppsim_tpu.engines import get_engine
    from ppsim_tpu.harness import timed_run_repeats
    from ppsim_tpu.initlib import init_particles

    kw = {} if cap is None else {"grid3_capacity": cap}
    config = SimConfig(num_parts=args.n, ndim=3, density=7e-6,
                       force_law="lj", dt=1e-4, **kw)
    state = init_particles(config, seed=42, method="fast")
    engine = get_engine("pallas3d", config)
    result, times = timed_run_repeats(engine, state, args.steps, 0,
                                      repeats=args.repeats,
                                      chunk_steps=args.chunk_steps)
    engine.check(result)
    best = min(times)
    return {
        "ab": "lj_capacity",
        "engine": "pallas3d",
        "variant": label,
        "force_law": "lj",
        "grid3_capacity": engine.capacity,  # post-auto-raise value
        "num_parts": args.n,
        "nsteps": args.steps,
        "seconds": best,
        "times": [round(t, 4) for t in times],
        "particle_steps_per_sec": args.n * args.steps / best,
        "max_bin_count": int(result.monitors.max_bin_count),
        "dropped": int(result.monitors.migrate_dropped),
        "deferred": int(result.monitors.deferred),
        "max_speed": float(result.monitors.max_speed),
        "chunk_steps": args.chunk_steps,
        "ts": time.time(),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=20_971_520)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--chunk-steps", type=int, default=40,
                    help="the r3 LJ stretch row's chunking (relay kills "
                         "single executions past ~1 min)")
    ap.add_argument("--out", default=None, help="append JSONL records here")
    ap.add_argument("--only", choices=("hand", "auto"), default=None,
                    help="run a single variant (e.g. re-validating the "
                         "auto path after a floor recalibration without "
                         "re-paying the hand control's 8 min)")
    args = ap.parse_args(argv)
    if not args.chunk_steps:
        args.chunk_steps = None  # 0 = one monolithic program

    variants = [(12, "hand_cap12_r3"), (None, "auto_floor")]
    if args.only:
        variants = [v for v in variants if
                    (v[0] is None) == (args.only == "auto")]
    records = []
    for cap, label in variants:
        try:
            rec = run_variant(args, cap, label)
        except RuntimeError as e:
            rec = {"ab": "lj_capacity", "engine": "pallas3d",
                   "variant": label, "num_parts": args.n,
                   "nsteps": args.steps, "failed": str(e),
                   "ts": time.time()}
        print(json.dumps(rec), flush=True)
        records.append(rec)
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")

    ok = [r for r in records if "seconds" in r]
    if len(ok) == 2:
        print(f"# auto (cap {ok[1]['grid3_capacity']}): "
              f"{ok[0]['seconds'] / ok[1]['seconds']:.3f}x vs hand cap 12",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
