"""Empirical roofline for the flagship step kernel (VERDICT r1 task 8).

The reference's perf analysis is an nvprof kernel split (part3 write-up §6:
forces 74.85% / rebin 19.05% / move 5.72%). The TPU analog here goes one
level deeper: measure the chip's *achievable* peaks on this very relay
(device kinds and clocks vary; quoting datasheet numbers would be
unverifiable), then place the step kernel against them.

Three measurements, one process:

1. **VPU f32 peak** — a Pallas kernel that is a pure FMA chain on
   VMEM-resident planes (the same op mix as the pair loop's hot body).
2. **HBM stream bandwidth** — XLA elementwise saxpy over an HBM-sized
   array (read + write).
3. **The step kernel itself** — marginal per-step seconds via the
   variant-subtraction harness (ppsim_tpu.profiling), converted to
   pair-interactions/s and FLOP/s from the static op counts.

Prints one JSON line; feeds the BASELINE.md roofline section.

Usage:  python bench/mfu.py  [-n 20971520]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(1, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sync_scalar(x):
    """Real device->host fence (block_until_ready is unreliable on the relay)."""
    return float(np.asarray(jax.tree.leaves(x)[0].ravel()[0]))


def _best(fn, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


# --------------------------------------------------------------- VPU peak
def vpu_peak_flops(iters: int = 256, rows: int = 4096, cols: int = 1024,
                   calls: int = 48, chains: int = 8) -> float:
    """Peak f32 VPU FLOP/s: ``chains`` independent FMA chains on
    VMEM-resident blocks (a single chain is latency-bound — each FMA waits
    on the previous one — and under-reads the peak ~5x)."""

    def kernel(x_ref, o_ref):
        a = x_ref[...]
        b = a * 1.0000001 + 0.5
        accs = [a + jnp.float32(k) for k in range(chains)]
        for _ in range(iters):
            accs = [acc * b + a for acc in accs]  # chains independent FMAs
        out = accs[0]
        for acc in accs[1:]:
            out = out + acc
        o_ref[...] = out

    br = 256
    x = jnp.ones((rows, cols), jnp.float32) * 0.999

    @jax.jit
    def run(x):
        spec = pl.BlockSpec((br, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
        f = pl.pallas_call(
            kernel, grid=(rows // br,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )
        y = x
        for _ in range(calls):
            y = f(y)
        return y[0, 0]

    _sync_scalar(run(x))  # compile
    t = _best(lambda: _sync_scalar(run(x)))
    return rows * cols * iters * chains * 2 * calls / t


# ----------------------------------------------------------- HBM bandwidth
def hbm_stream_bw(mb: int = 1024, calls: int = 16) -> float:
    """Streaming bytes/s via an explicit Pallas copy kernel (read + write).

    XLA-side attempts are unusable here: chained saxpies fuse into one
    pass (inflating the byte count) and slice-returns narrow the whole
    computation to one element (measuring dispatch latency). A pallas_call
    copy has a fixed read+write per block; chaining ``calls`` of them
    amortizes the relay dispatch latency.
    """
    n = mb * 1024 * 1024 // 4
    rows, cols = n // 2048, 2048
    x = jnp.ones((rows, cols), jnp.float32)

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    spec = pl.BlockSpec((512, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def run(x):
        f = pl.pallas_call(
            kernel, grid=(rows // 512,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        )
        y = x
        for _ in range(calls):
            y = f(y)
        return y[0, 0]

    _sync_scalar(run(x))
    t = _best(lambda: _sync_scalar(run(x)))
    return calls * 2 * n * 4 / t


# ------------------------------------------------------------- step kernel
def step_kernel_numbers(n: int):
    from ppsim_tpu.config import SimConfig
    from ppsim_tpu.engines import get_engine
    from ppsim_tpu.initlib import init_particles
    from ppsim_tpu.ops.grid_ops import SlabGeometry
    from ppsim_tpu.profiling import phase_times

    cfg = SimConfig(num_parts=n)
    geom = SlabGeometry.for_config(cfg)
    state = init_particles(cfg, seed=42, method="fast")
    eng = get_engine("pallas", cfg)
    times = phase_times(eng, state, steps=40)

    cap = geom.capacity
    bins = geom.rows_pad * geom.cols_pad
    # Symmetric kernel: triangle cap(cap-1)/2 + 4 full directions cap^2
    pair_planes = cap * (cap - 1) // 2 + 4 * cap * cap
    pairs_per_step = bins * pair_planes
    # Hot pair body (repulsive law): dx,dy (2) r2 (3) max (1) rsqrt (~1)
    # u (2) coef (2) where (1) fx,fy (2) four accumulator adds (4) = ~18
    flops_per_pair = 18
    occupancy = n / bins
    return {
        "phase_ms": {k: round(v * 1e3, 3) for k, v in times.items()},
        "grid": {"rows": geom.rows_pad, "cols": geom.cols_pad,
                 "capacity": cap, "mean_occupancy": round(occupancy, 2)},
        "pair_planes_per_bin": pair_planes,
        "pairs_per_step": pairs_per_step,
        "useful_pair_fraction": round(
            # alive x alive pairs among evaluated slab-pair lanes
            (occupancy / cap) ** 2, 3),
        "kernel_flops_per_step": pairs_per_step * flops_per_pair,
        "force_move_s": times["force+move"],
        "step_s": times["step"],
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=20_971_520)
    ap.add_argument("--skip-step", action="store_true",
                    help="only measure the device peaks")
    args = ap.parse_args(argv)

    dev = jax.devices()[0]
    out = {
        "device_kind": dev.device_kind,
        "platform": dev.platform,
        "vpu_f32_peak_tflops": round(vpu_peak_flops() / 1e12, 3),
        "hbm_stream_gbps": round(hbm_stream_bw() / 1e9, 1),
    }
    if not args.skip_step:
        k = step_kernel_numbers(args.n)
        out.update(k)
        out["kernel_tflops"] = round(
            k["kernel_flops_per_step"] / k["force_move_s"] / 1e12, 3)
        out["vpu_utilization"] = round(
            out["kernel_tflops"] / out["vpu_f32_peak_tflops"], 3)
        out["pair_interactions_per_sec"] = round(
            k["pairs_per_step"] / k["force_move_s"] / 1e9, 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
