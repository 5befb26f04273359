"""Mosaic (Pallas TPU) kernels for the slab-grid force and fused step.

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

:func:`grid_step_pallas` fuses the Verlet move + wall reflection into the
force kernel (the integrator runs while the accelerations are still in
registers). It optionally takes neighbor ghost rows and a global-row offset,
which is all the sharded engine needs to run the same kernel per shard —
ghost rows arrive by ``lax.ppermute`` instead of the BIG fill.

Measured ~3 TFLOP/s effective on v5e, ~1 G particle-steps/s full-step at
~1M particles — ~3x the reference P100's total throughput.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ppsim_tpu.ops.binning import BIG
from ppsim_tpu.ops.grid_ops import SlabGeometry

__all__ = ["grid_force_pallas", "grid_step_pallas", "row_views"]

_VMEM_BUDGET = 8 * 1024 * 1024


def _pick_row_block(geom: SlabGeometry, nplanes: int, rows: int) -> int:
    # Mosaic requires the block's second-minor dim divisible by 8 (or the
    # full dimension); the raised vmem_limit_bytes covers the footprint.
    return 8 if rows % 8 == 0 else rows


def row_views(f, fill, halo: int, ghost_top=None, ghost_bot=None):
    """2*halo+1 row-shifted full-size views of ``f`` (axis 1), edge rows
    taken from the ghost blocks when given, else filled."""
    cap, R, C = f.shape
    if ghost_top is None:
        ghost_top = jnp.full((cap, halo, C), fill, f.dtype)
    if ghost_bot is None:
        ghost_bot = jnp.full((cap, halo, C), fill, f.dtype)
    ext = jnp.concatenate([ghost_top, f, ghost_bot], axis=1)
    return [ext[:, o : o + R] for o in range(2 * halo + 1)]


def _pair_accum(xs, ys, ax, ay, xr_ref, yr_ref, dr, geom, cap, cols, lane,
                cutoff, min_r, mass):
    """Accumulate one neighbor-row's 3-column stencil contributions.

    Op-count discipline (this loop body runs 9*cap^2 times per bin, so every
    plane op counts): neighbor offsets are hoisted out of the self-slot loop,
    the edge-lane masks out of the j loop, and the coefficient is factored as
    u - cutoff*(rinv*u) with u = inv2/mass — two multiplies and an FMA past
    the rsqrt, instead of the naive four-op chain.
    """
    c2 = jnp.float32(cutoff * cutoff)
    mr2 = jnp.float32(min_r * min_r)
    inv_mass = jnp.float32(1.0 / mass)
    cut = jnp.float32(cutoff)
    offx = jnp.float32(dr * geom.bin_size)
    bad_of = {1: lane == (cols - 1), -1: lane == 0}
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
                xn = jnp.where(bad_of[dc], BIG, xn)
            xno = xn if dr == 0 else xn + offx
            yno = yn if dc == 0 else yn + jnp.float32(dc * geom.bin_size)
            for s in range(cap):
                dx = xno - xs[s]
                dy = yno - ys[s]
                r2 = dx * dx + dy * dy
                r2c = jnp.maximum(r2, mr2)
                rinv = jax.lax.rsqrt(r2c)
                u = inv_mass * (rinv * rinv)
                coef = jnp.where(r2 <= c2, u - cut * (rinv * u), 0.0)
                ax[s] = ax[s] + coef * dx
                ay[s] = ay[s] + coef * dy
    return ax, ay


def _force_kernel(xm_ref, x0_ref, xp_ref, ym_ref, y0_ref, yp_ref,
                  ax_ref, ay_ref, *, cap, cols, geom, cutoff, min_r, mass):
    lane = jax.lax.broadcasted_iota(jnp.int32, x0_ref.shape[1:], 1)
    xs = [x0_ref[s] for s in range(cap)]
    ys = [y0_ref[s] for s in range(cap)]
    ax = [jnp.zeros_like(xs[0]) for _ in range(cap)]
    ay = [jnp.zeros_like(ys[0]) for _ in range(cap)]
    for dr, xr, yr in ((-1, xm_ref, ym_ref), (0, x0_ref, y0_ref), (1, xp_ref, yp_ref)):
        ax, ay = _pair_accum(xs, ys, ax, ay, xr, yr, dr, geom, cap, cols, lane,
                             cutoff, min_r, mass)
    for s in range(cap):
        ax_ref[s] = ax[s]
        ay_ref[s] = ay[s]


@functools.partial(
    jax.jit, static_argnames=("geom", "cutoff", "min_r", "mass", "interpret")
)
def grid_force_pallas(xl, yl, geom: SlabGeometry, cutoff, min_r, mass, interpret=False):
    """Force-only kernel (accelerations out); single-chip convenience API."""
    cap = geom.capacity
    R, C = xl.shape[1], geom.cols_pad
    br = _pick_row_block(geom, nplanes=8 * cap, rows=R)
    xv = row_views(xl, BIG, 1)
    yv = row_views(yl, BIG, 1)
    spec = pl.BlockSpec((cap, br, C), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _force_kernel, cap=cap, cols=C, geom=geom,
        cutoff=cutoff, min_r=min_r, mass=mass,
    )
    ax, ay = pl.pallas_call(
        kernel,
        grid=(R // br,),
        in_specs=[spec] * 6,
        out_specs=[spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((cap, R, C), jnp.float32)] * 2,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=R * C * cap * cap * 9 * 14,
            bytes_accessed=R * C * cap * 4 * 8,
            transcendentals=R * C * cap * cap * 9,
        ),
    )(*xv, *yv)
    return ax, ay


def _step_kernel(xm_ref, x0_ref, xp_ref, ym_ref, y0_ref, yp_ref,
                 vx_ref, vy_ref, pid_ref, grow_ref,
                 xo_ref, yo_ref, vxo_ref, vyo_ref,
                 ax_ref, ay_ref,
                 *, cap, cols, geom: SlabGeometry,
                 cutoff, min_r, mass, dt, size):
    """Fused force + Verlet move + wall reflection (one pass per step).

    The integrator (reference: serial.cpp:44-61) runs on the accumulated
    accelerations while they are still in VMEM, so the move phase costs no
    extra HBM pass. ``grow_ref`` carries each bin's global row index (shard
    offset included); ``pid`` is read-only — slots never change outside the
    rebin shuffle.

    Accelerations accumulate into the ``ax_ref/ay_ref`` VMEM scratch rather
    than SSA values: Mosaic's allocator keeps every live plane on the kernel
    stack, and ``4 x capacity`` live accumulator planes blow past the chip's
    128MB VMEM at wide grids.
    """
    dtf = jnp.float32(dt)
    L = jnp.float32(size)
    bs = jnp.float32(geom.bin_size)
    c2 = jnp.float32(cutoff * cutoff)
    mr2 = jnp.float32(min_r * min_r)
    inv_mass = jnp.float32(1.0 / mass)
    lane = jax.lax.broadcasted_iota(jnp.int32, x0_ref.shape[1:], 1)
    row_off = grow_ref[...].astype(jnp.float32) * bs
    col_off = lane.astype(jnp.float32) * bs

    for s in range(cap):
        ax_ref[s] = jnp.zeros_like(ax_ref[s])
        ay_ref[s] = jnp.zeros_like(ay_ref[s])

    # Neighbor slabs via fori_loop with dynamic ref reads: unrolling the
    # j-loop makes Mosaic's per-value stack exceed VMEM at wide grids
    # (observed 173MB at 1920 lanes) and inflates compile time.
    # Same op-count discipline as _pair_accum: offsets hoisted out of the
    # self-slot loop, edge masks out of the j loop, coefficient factored as
    # u - cutoff*(rinv*u) — this body runs 9*cap^2 times per bin.
    cut = jnp.float32(cutoff)
    bad_of = {1: lane == (cols - 1), -1: lane == 0}
    for dr, xr, yr in ((-1, xm_ref, ym_ref), (0, x0_ref, y0_ref), (1, xp_ref, yp_ref)):
        offx = jnp.float32(dr * geom.bin_size)

        def j_body(j, _, xr=xr, yr=yr, offx=offx, dr=dr):
            xj = xr[j]
            yj = yr[j]
            for dc in (-1, 0, 1):
                if dc == 0:
                    xn, yn = xj, yj
                else:
                    sh = (-dc) % cols
                    xn = pltpu.roll(xj, sh, 1)
                    yn = pltpu.roll(yj, sh, 1)
                    xn = jnp.where(bad_of[dc], BIG, xn)
                xno = xn if dr == 0 else xn + offx
                yno = yn if dc == 0 else yn + jnp.float32(dc * geom.bin_size)
                for s in range(cap):
                    dx = xno - x0_ref[s]
                    dy = yno - y0_ref[s]
                    r2 = dx * dx + dy * dy
                    r2c = jnp.maximum(r2, mr2)
                    rinv = jax.lax.rsqrt(r2c)
                    u = inv_mass * (rinv * rinv)
                    coef = jnp.where(r2 <= c2, u - cut * (rinv * u), 0.0)
                    ax_ref[s] = ax_ref[s] + coef * dx
                    ay_ref[s] = ay_ref[s] + coef * dy
            return 0

        jax.lax.fori_loop(0, cap, j_body, 0)

    for s in range(cap):
        alive = pid_ref[s] >= 0
        vx = jnp.where(alive, vx_ref[s] + ax_ref[s] * dtf, 0.0)
        vy = jnp.where(alive, vy_ref[s] + ay_ref[s] * dtf, 0.0)
        xl = x0_ref[s] + vx * dtf
        yl = y0_ref[s] + vy * dtf

        gx = xl + row_off
        out = (gx < 0.0) | (gx > L)
        mfold = jnp.mod(gx, 2.0 * L)
        xl = jnp.where(out, (L - jnp.abs(mfold - L)) - row_off, xl)
        vx = jnp.where(out & (mfold > L), -vx, vx)

        gy = yl + col_off
        out = (gy < 0.0) | (gy > L)
        mfold = jnp.mod(gy, 2.0 * L)
        yl = jnp.where(out, (L - jnp.abs(mfold - L)) - col_off, yl)
        vy = jnp.where(out & (mfold > L), -vy, vy)

        xo_ref[s] = jnp.where(alive, xl, BIG)
        yo_ref[s] = jnp.where(alive, yl, BIG)
        vxo_ref[s] = vx
        vyo_ref[s] = vy


@functools.partial(
    jax.jit,
    static_argnames=("geom", "cutoff", "min_r", "mass", "dt", "size", "interpret"),
)
def grid_step_pallas(xl, yl, vx, vy, pid, geom: SlabGeometry,
                     cutoff, min_r, mass, dt, size, interpret=False,
                     row0=None,
                     ghosts: Optional[Tuple] = None):
    """Fused force+move step. Returns (xl', yl', vx', vy').

    ``row0``: traced global row index of this array's first row (sharded
    engine passes ``axis_index * rows_local``; default 0).
    ``ghosts``: optional (top_xl, top_yl, bot_xl, bot_yl), each (cap, 1, C) —
    neighbor boundary rows for the force stencil (sharded halo exchange).
    """
    cap = geom.capacity
    R, C = xl.shape[1], geom.cols_pad
    br = _pick_row_block(geom, nplanes=14 * cap + 1, rows=R)

    if ghosts is None:
        xv = row_views(xl, BIG, 1)
        yv = row_views(yl, BIG, 1)
    else:
        top_xl, top_yl, bot_xl, bot_yl = ghosts
        xv = row_views(xl, BIG, 1, top_xl, bot_xl)
        yv = row_views(yl, BIG, 1, top_yl, bot_yl)

    base = 0 if row0 is None else row0
    grow = base + jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)

    spec = pl.BlockSpec((cap, br, C), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((br, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _step_kernel, cap=cap, cols=C, geom=geom,
        cutoff=cutoff, min_r=min_r, mass=mass, dt=dt, size=size,
    )
    out = pl.pallas_call(
        kernel,
        grid=(R // br,),
        in_specs=[spec] * 6 + [spec] * 3 + [gspec],
        out_specs=[spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((cap, R, C), jnp.float32)] * 4,
        scratch_shapes=[
            pltpu.VMEM((cap, br, C), jnp.float32),
            pltpu.VMEM((cap, br, C), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=R * C * cap * cap * 9 * 14,
            bytes_accessed=R * C * cap * 4 * 13,
            transcendentals=R * C * cap * cap * 9,
        ),
    )(*xv, *yv, vx, vy, pid, grow)
    return tuple(out)
