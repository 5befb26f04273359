#!/usr/bin/env python
"""One-process single-device A/B: 3D strip engine vs the 3D flagship.

The 2D multi-chip paths have a measured single-device overhead table
(ab:tile_single_device rows: strip 0.997x, tile 1.001x, ghosted tile
0.81x vs pallas). This is the 3D analog: ``sharded_grid3d`` on a
one-device mesh (both impls) against ``pallas3d``, so the per-shard tax
of the y-strip halo machinery (ghost y-slab extension, count-plane
shuffle) is a recorded number rather than an assumption — real-ICI 3D
scaling stays hardware-gated, and this plus the CPU-mesh parity tests
is the evidence a single chip supports.

Usage:
    python bench/ab_strip3.py                 # n=4.2M x 1000, best of 3
    python bench/ab_strip3.py -n 20971520 --chunk-steps 100 --out ...
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=4_194_304)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--chunk-steps", type=int, default=None)
    ap.add_argument("--out", default=None, help="append JSONL records here")
    args = ap.parse_args(argv)

    import jax

    from ppsim_tpu.config import SimConfig
    from ppsim_tpu.engines import get_engine
    from ppsim_tpu.engines.sharded_grid3d import ShardedGrid3DEngine
    from ppsim_tpu.harness import timed_run_repeats
    from ppsim_tpu.initlib import init_particles

    config = SimConfig(num_parts=args.n, ndim=3, density=7e-6)
    state = init_particles(config, seed=42, method="fast")
    dev = jax.devices()[:1]

    variants = [
        ("pallas3d", lambda: get_engine("pallas3d", config)),
        ("sharded_grid3d_1dev",
         lambda: ShardedGrid3DEngine(config, devices=dev, impl="pallas")),
        ("sharded_grid3d_1dev_xla",
         lambda: ShardedGrid3DEngine(config, devices=dev, impl="xla")),
    ]
    records = []
    for name, mk in variants:
        engine = mk()
        result, times = timed_run_repeats(
            engine, state, args.steps, 0,
            repeats=args.repeats, chunk_steps=args.chunk_steps,
        )
        engine.check(result)
        best = min(times)
        rec = {
            "ab": "strip3_single_device",
            "variant": name,
            "num_parts": args.n,
            "nsteps": args.steps,
            "seconds": best,
            "times": [round(t, 4) for t in times],
            "particle_steps_per_sec": args.n * args.steps / best,
            "max_bin_count": int(result.monitors.max_bin_count),
            "dropped": int(result.monitors.migrate_dropped),
            "chunk_steps": args.chunk_steps,
            "ts": time.time(),
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)

    if args.out:
        with open(args.out, "a") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
    base = records[0]["seconds"]
    for r in records[1:]:
        print(f"# {r['variant']}: {base / r['seconds']:.4f}x vs pallas3d",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
