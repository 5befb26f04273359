#!/usr/bin/env python
"""Benchmark sweeps mirroring the reference's job scripts (SURVEY.md C23).

- ``--sizes``   : problem-size sweep (part1/job-serial:9-16 1k..128k;
                  part3/benchmark-gpu:8-12 1k..16.384M)
- ``--strong``  : strong scaling at fixed n over device counts
                  (part1/strong-scale:11-20; part2/job-mpi:6-13)
- ``--weak``    : weak scaling at fixed n/device (part1/weak-scale:10-22)

Each run appends a JSONL record (the structured analog of the reference's
stdout summary line) to ``--out``; plot with bench/plot.py.

Device-count scaling uses the sharded engine over a CPU mesh
(``--cpu-mesh``) when no multi-chip TPU is attached — the srun-free testing
story — or over real TPU devices when present.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(engine_name: str, n: int, steps: int, devices=None, seed: int = 42):
    import jax

    from ppsim_tpu.config import SimConfig
    from ppsim_tpu.engines import get_engine
    from ppsim_tpu.engines.sharded import ShardedEngine
    from ppsim_tpu.harness import timed_run
    from ppsim_tpu.initlib import init_particles

    config = SimConfig(num_parts=n)
    state = init_particles(config, seed=seed, method="fast")
    if engine_name == "sharded" and devices is not None:
        engine = ShardedEngine(config, devices=jax.devices()[:devices])
    else:
        engine = get_engine(engine_name, config)
    result, seconds = timed_run(engine, state, steps, 0)
    engine.check(result)
    return {
        "engine": engine_name,
        "num_parts": n,
        "nsteps": steps,
        "num_devices": devices or 1,
        "seconds": seconds,
        "particle_steps_per_sec": n * steps / seconds,
        "ts": time.time(),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", default="pallas")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--out", default="bench/results.jsonl")
    ap.add_argument("--sizes", type=str, default=None,
                    help="comma list of n, e.g. 1000,4000,...  (default: the "
                         "reference's GPU sweep 1k..16.384M)")
    ap.add_argument("--strong", type=int, default=None, metavar="N",
                    help="strong scaling at n=N over 1,2,4,8 devices (sharded)")
    ap.add_argument("--weak", type=int, default=None, metavar="N_PER_DEV",
                    help="weak scaling at N_PER_DEV per device over 1,2,4,8")
    ap.add_argument("--cpu-mesh", type=int, default=0)
    args = ap.parse_args(argv)

    if args.cpu_mesh:
        from ppsim_tpu.testing import force_cpu_devices

        force_cpu_devices(args.cpu_mesh)

    records = []
    if args.strong:
        for d in (1, 2, 4, 8):
            records.append(run_one("sharded", args.strong, args.steps, devices=d))
            print(json.dumps(records[-1]), flush=True)
    elif args.weak:
        for d in (1, 2, 4, 8):
            records.append(
                run_one("sharded", args.weak * d, args.steps, devices=d)
            )
            print(json.dumps(records[-1]), flush=True)
    else:
        if args.sizes:
            sizes = [int(s) for s in args.sizes.split(",")]
        else:
            # part3/benchmark-gpu sweep: 4x steps from 1k; largest first
            # omitted by default to keep runtime sane.
            sizes = [1000 * 4**k for k in range(6)]
        for n in sizes:
            records.append(run_one(args.engine, n, args.steps))
            print(json.dumps(records[-1]), flush=True)

    with open(args.out, "a") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
