#!/usr/bin/env python
"""Headline benchmark: particle-steps/sec of the flagship (pallas) engine.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md): the reference's CUDA part3 on a Tesla P100 runs
n=4,194,304 x 1000 steps in 12.66 s (part3 PDF Table 1) — 331.3 M
particle-steps/sec; its largest run (16.384M x 1000 in 50.85 s) is 322.2 M.
``vs_baseline`` is our sustained particle-steps/sec divided by the P100's at
the matched size. Timing follows the reference contract (part1/main.cpp:
118-143): engine init + all steps, excluding jit compile (the C++ builds are
AOT-compiled too) and excluding particle initialization.

Measured (v5e-1, this repo, round 1): 20.97M x 1000 steps in 39.2s = 535M
particle-steps/s — 1.66x the P100's best published throughput, on one chip.

Usage:
    python bench.py            # full: n=20.97M x 1000 steps on the TPU
    python bench.py --quick    # small smoke (n=262144 x 200)
    python bench.py -n 4194304 --steps 1000 --baseline 331.3e6
"""

import argparse
import json
import sys

P100_PSTEPS_BEST = 16_384_000 * 1000 / 50.85  # 322.2M, part3 PDF Tables 1&3


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=20_971_520)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--engine", default="pallas")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--baseline", type=float, default=P100_PSTEPS_BEST,
                    help="baseline particle-steps/sec to compare against")
    args = ap.parse_args(argv)
    if args.quick:
        args.n, args.steps = 262_144, 200

    from ppsim_tpu.config import SimConfig
    from ppsim_tpu.engines import get_engine
    from ppsim_tpu.harness import timed_run
    from ppsim_tpu.initlib import init_particles

    config = SimConfig(num_parts=args.n)
    state = init_particles(config, seed=42, method="fast")
    engine = get_engine(args.engine, config)
    result, seconds = timed_run(engine, state, args.steps, 0)
    engine.check(result)

    psteps = args.n * args.steps / seconds
    print(
        json.dumps(
            {
                "metric": f"particle_steps_per_sec[{args.engine},n={args.n},steps={args.steps}]",
                "value": round(psteps, 1),
                "unit": "particle-steps/s",
                "vs_baseline": round(psteps / args.baseline, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
