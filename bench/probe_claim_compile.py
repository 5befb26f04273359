#!/usr/bin/env python
"""Bounded probe: does the compile-safe claim pack compile ON THE RELAY
during the degraded-helper window that rejects every 20M sorted-scatter/
sort temp? Compiles + runs init_carry (claim), one 8-step segment, and
the final-state gather at the full 20.97M 2D LJ gate geometry."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    import jax
    from ppsim_tpu.harness import build_parser, config_from_args
    from ppsim_tpu.engines import get_engine
    from ppsim_tpu.initlib import init_particles

    args = build_parser().parse_args(
        ["-n", "20971520", "-s", "42", "--force-law", "lj", "--dt", "1e-4",
         "--grid-pack-mode", "claim"])
    cfg = config_from_args(args)
    eng = get_engine("pallas", cfg)
    t0 = time.time()
    st = init_particles(cfg, seed=42, method=args.init)
    print(f"init done {time.time()-t0:.1f}s", flush=True)
    st = jax.device_put(st)
    t0 = time.time()
    carry = eng.init_carry(st)
    seg = eng._segment_program(8, eng._segment_phase(0))
    carry = seg(carry)
    fin = eng.final_state_jit(carry)
    x0 = float(np.asarray(fin.pos[0, 0]))
    print(f"claim pack+segment+final compiled and ran "
          f"in {time.time()-t0:.1f}s; pos[0,0]={x0:.6f}", flush=True)
    print(f"max_bin_count={int(eng.monitors_of(carry).max_bin_count)}",
          flush=True)
    return 0

if __name__ == "__main__":
    sys.exit(main())
