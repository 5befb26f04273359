#!/usr/bin/env python
"""Measure the LJ occupancy-growth curve: running max bin occupancy vs step.

Why this exists (r4): the auto-capacity model "initial packing + 1 slot of
LJ run-tail margin" dropped 5 particles at 20.97M (ab:lj_capacity,
results_tpu3d.jsonl) because the auto-snapped geometry packs to only 8 at
t=0 while LJ condensation grows pocket occupancy past 11 over the run. Any
principled LJ capacity floor needs the SHAPE of that growth: does running
max occupancy saturate early (then a short probe run can choose capacity)
or climb all run long (then only a calibrated static model or mid-run
escalation works)? The reference has no analog — its attractive-law
support is zero — but the discipline mirrors its ablation tables (part3
PDF Table 2): measure, then set constants.

Method: run the pallas3d stretch config at a GENEROUS probe capacity
(default 15, comfortably above the observed 13) so stored counts equal
true demand, in cadence-aligned chunks, fetching the running-max monitor
scalar between chunks (~24 ms/fetch through the relay — negligible).
Emits ONE JSON line per size with the full curve.

Usage:
    python bench/lj_occupancy.py -n 1048576 --out bench/results_tpu3d.jsonl
    python bench/lj_occupancy.py -n 20971520 --capacity 15
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(n: int, cap: int, steps: int, chunk_target: int,
            force_law: str = "lj", dt: float = 1e-4):
    import numpy as np

    from ppsim_tpu.config import SimConfig
    from ppsim_tpu.engines import get_engine
    from ppsim_tpu.initlib import init_particles

    config = SimConfig(num_parts=n, ndim=3, density=7e-6,
                       force_law=force_law, dt=dt, grid3_capacity=cap)
    state = init_particles(config, seed=42, method="fast")
    engine = get_engine("pallas3d", config)

    # Cadence-aligned chunking (same rule as timed_run_repeats).
    quantum = getattr(engine, "rebin_every", 1)
    chunk = max(quantum, (chunk_target // quantum) * quantum)
    nsteps = ((steps + chunk - 1) // chunk) * chunk

    import jax

    carry = engine.init_carry(jax.device_put(state))
    program = engine._program(chunk, 0)
    compiled = program.lower(carry).compile()

    curve = []
    t0 = time.perf_counter()
    for c in range(nsteps // chunk):
        carry, _ = compiled(carry)
        m = jax.tree.map(np.asarray, engine.monitors_of(carry))
        curve.append({
            "step": (c + 1) * chunk,
            "max_bin_count": int(m.max_bin_count),
            "deferred": int(m.deferred),
            "dropped": int(m.migrate_dropped),
        })
    wall = time.perf_counter() - t0

    g = engine.geom
    return {
        "ab": "lj_occupancy_curve",
        "engine": "pallas3d",
        "force_law": force_law,
        "num_parts": n,
        "nsteps": nsteps,
        "chunk_steps": chunk,
        "probe_capacity": engine.capacity,
        "geometry": [g.ys, g.xs, g.zs],
        "mean_occupancy": n / (g.ys * g.xs * g.zs),
        "curve": curve,
        "final_max": curve[-1]["max_bin_count"],
        "dropped": curve[-1]["dropped"],
        "seconds": wall,
        "ts": time.time(),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, nargs="+",
                    default=[1_048_576, 4_194_304, 20_971_520])
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--chunk-steps", type=int, default=40)
    ap.add_argument("--capacity", type=int, default=14,
                    help="probe capacity: high enough that stored counts "
                         "equal true demand (observed LJ max is 13; the "
                         "chooser adds +1/+2 anisotropy slots on top)")
    ap.add_argument("--force-law", default="lj")
    ap.add_argument("--dt", type=float, default=1e-4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    for n in args.n:
        rec = measure(n, args.capacity, args.steps, args.chunk_steps,
                      args.force_law, args.dt)
        print(json.dumps(rec), flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
