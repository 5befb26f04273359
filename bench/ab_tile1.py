#!/usr/bin/env python
"""One-process single-device A/B: tile engine vs strip engine vs pallas.

The r4 tile-mesh Mosaic path must cost nothing when the mesh doesn't cut
the col axis (VERDICT r3 #1's regression gate): on a 1x1 mesh the tile
engine compiles the exact single-chip kernel programs, so its time must
match ``sharded_grid`` impl="pallas" and the plain ``pallas`` engine
within noise. The fourth variant forces the ghost-lane col extension on
the same single chip (ghost blocks full of BIG sentinels — physics
unchanged) to measure the per-shard tax a REAL col-cut tile would pay;
this is the number that sizes the 2-D mesh's overhead until multi-chip
hardware is reachable.

Usage:
    python bench/ab_tile1.py                 # n=4.2M x 1000, best of 3
    python bench/ab_tile1.py -n 20971520 --out bench/results_tpu.jsonl
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
    from ppsim_tpu.engines.sharded_grid import ShardedGridEngine
    from ppsim_tpu.engines.sharded_tile import ShardedTileEngine
    from ppsim_tpu.harness import timed_run_repeats
    from ppsim_tpu.initlib import init_particles

    config = SimConfig(num_parts=args.n)
    state = init_particles(config, seed=42, method="fast")
    dev = jax.devices()[:1]

    def tile_ghosted():
        eng = ShardedTileEngine(config, devices=dev, mesh_shape=(1, 1))
        # Force the col-cut code path on one chip: ghost blocks arrive as
        # BIG fill (edge semantics), so the physics is unchanged and the
        # measured delta is the pure ghost-lane + gcol-plane tax.
        eng.ghost_lanes = 64
        return eng

    variants = [
        ("pallas", lambda: get_engine("pallas", config)),
        ("sharded_grid_1dev",
         lambda: ShardedGridEngine(config, devices=dev, impl="pallas")),
        ("sharded_tile_1x1",
         lambda: ShardedTileEngine(config, devices=dev, mesh_shape=(1, 1))),
        ("sharded_tile_1x1_ghosted", tile_ghosted),
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
            "ab": "tile_single_device",
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
        print(f"# {r['variant']}: {base / r['seconds']:.4f}x vs pallas",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
