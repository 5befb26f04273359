#!/usr/bin/env python
"""Instantaneous by-position occupancy demand vs step (3D repulsive).

Why (r5): the capacity-phase repack assumed the 20.97M hot bin (t=0 lattice
packs 12) is a transient that disperses "within ~40 steps". The first TPU
attempt measured otherwise: a step-40 position pack overflowed capacity 12
— not just the target 11 — while the cap-12 run's deferral-aware rebins ran
clean (deferred 15362, dropped 0). So the quantity that decides whether a
repack-to-11 can EVER commit is the instantaneous max by-position bin
demand (a drop-free pack needs demand <= target at one program boundary),
and the running-max monitors cannot show its decay.

Method: run the auto stretch config in cadence-aligned chunks; after each
chunk, gather the slab to a particle list and histogram the position-bin
ids (one jitted program, one scalar fetch per chunk). Also record the
per-chunk (reset) rebin running max for the deferral-absorbed view.

Usage:
    python bench/repack_demand.py -n 20971520 --out bench/results_tpu3d.jsonl
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(n: int, steps: int, chunk_target: int, density: float):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ppsim_tpu.config import SimConfig
    from ppsim_tpu.engines import get_engine
    from ppsim_tpu.engines.base import Monitors
    from ppsim_tpu.engines.grid import GridCarry
    from ppsim_tpu.initlib import init_particles
    from ppsim_tpu.ops import grid3d_ops

    config = SimConfig(num_parts=n, ndim=3, density=density,
                       grid3_repack=False)  # probe the raw demand, no phases
    state = init_particles(config, seed=42, method="fast")
    engine = get_engine("pallas3d", config)

    quantum = getattr(engine, "rebin_every", 1)
    chunk = max(quantum, (chunk_target // quantum) * quantum)
    nsteps = ((steps + chunk - 1) // chunk) * chunk

    carry = engine.init_carry(jax.device_put(state))
    geom = engine.geom  # post auto-raise (the packing capacity)

    @jax.jit
    def max_demand(c):
        pos, _ = grid3d_ops.slab3_to_particles(c.slab, geom, n)
        bx = jnp.clip((pos[:, 0] / geom.bsx).astype(jnp.int32), 0, geom.xs - 1)
        by = jnp.clip((pos[:, 1] / geom.bsy).astype(jnp.int32), 0, geom.ys - 1)
        bz = jnp.clip((pos[:, 2] / geom.bsz).astype(jnp.int32), 0, geom.zs - 1)
        bin_id = (by * geom.xs + bx) * geom.zs + bz
        counts = jnp.zeros((geom.ys * geom.xs * geom.zs,), jnp.int32)
        return counts.at[bin_id].add(1).max()

    @jax.jit
    def reset_monitors(c):
        return GridCarry(c.slab, c.step, Monitors.zeros())

    program = engine._program(chunk, 0)
    compiled = program.lower(carry).compile()

    curve = [{"step": 0, "max_demand": int(max_demand(carry))}]
    t0 = time.perf_counter()
    for c in range(nsteps // chunk):
        carry, _ = compiled(carry)
        m = jax.tree.map(np.asarray, engine.monitors_of(carry))
        curve.append({
            "step": (c + 1) * chunk,
            "max_demand": int(max_demand(carry)),
            "chunk_rebin_max": int(m.max_bin_count),
            "chunk_deferred": int(m.deferred),
            "dropped": int(m.migrate_dropped),
        })
        carry = reset_monitors(carry)
    wall = time.perf_counter() - t0

    return {
        "ab": "repack_demand",
        "engine": "pallas3d",
        "force_law": config.force_law,
        "num_parts": n,
        "nsteps": nsteps,
        "chunk_steps": chunk,
        "capacity": engine.geom.capacity,
        "geometry": [geom.ys, geom.xs, geom.zs],
        "curve": curve,
        "min_demand": min(p["max_demand"] for p in curve),
        "seconds": wall,
        "ts": time.time(),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=20_971_520)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--chunk-steps", type=int, default=40)
    ap.add_argument("--density", type=float, default=7e-6)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    rec = measure(args.n, args.steps, args.chunk_steps, args.density)
    print(json.dumps(rec), flush=True)
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
