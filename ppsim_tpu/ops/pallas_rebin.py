"""Mosaic (Pallas TPU) kernel for the slab-grid 9-direction rebin shuffle.

The CUDA engine rebins with a global ``atomicAdd`` scatter (part3/gpu.cu:
92-112); the OpenMP engine with per-bin locks (part1/openmp.cpp:170-177).
The TPU has neither atomics nor locks — this kernel does the rebin as pure
data-parallel rank-matching, entirely in VMEM:

1. per source bin, leavers toward each of the 8 directions are compacted to
   ``evac_capacity`` candidate planes by rank-matching over the slab axis;
2. per destination bin, the 8 shifted candidate groups are inserted into
   free slots by matching entrant-rank against free-slot-rank (a bijection,
   so no conflicts by construction).

Safety counters are computed afterwards in XLA from the pid planes: any
overflow (evac group, free slots) manifests as a *lost particle*, so
``count(before) - count(after)`` catches every failure mode — strictly
stronger than the reference, which corrupts silently on bin overflow.

Like the force kernel, the caller passes three row-shifted copies of each
field so neighbor access reduces to elementwise ops plus lane rolls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ppsim_tpu.ops.binning import BIG
from ppsim_tpu.ops.grid_ops import DIRS, RebinMonitors, SlabGeometry, SlabState

__all__ = ["grid_rebin_pallas"]

_VMEM_BUDGET = 9 * 1024 * 1024


def _pick_row_block(geom: SlabGeometry) -> int:
    for br in (8, 4, 2, 1):
        per_plane = br * geom.cols_pad * 4
        # 15 in + 5 out blocks of (cap, br, C), double-buffered.
        if 20 * geom.capacity * per_plane * 2 <= _VMEM_BUDGET and geom.rows_pad % br == 0:
            return br
    return 1


def _dirs_of(xl, yl, grow, gcol, geom: SlabGeometry, alive):
    """Per-slab direction components with physical-boundary clamping.

    ``grow``/``gcol`` are the global row/col index planes of this view.
    """
    inv = jnp.float32(1.0 / geom.bin_size)
    dirx = jnp.clip(jnp.floor(xl * inv).astype(jnp.int32), -1, 1)
    diry = jnp.clip(jnp.floor(yl * inv).astype(jnp.int32), -1, 1)
    dirx = jnp.where(alive, dirx, 0)
    diry = jnp.where(alive, diry, 0)
    dirx = jnp.clip(dirx, -jnp.minimum(grow, 1), jnp.minimum(geom.rows - 1 - grow, 1))
    diry = jnp.clip(diry, -jnp.minimum(gcol, 1), jnp.minimum(geom.cols - 1 - gcol, 1))
    return dirx, diry


def _rebin_kernel(*refs, cap, evac_cap, geom: SlabGeometry, br):
    # inputs: 5 fields x 3 row-views (xl, yl, vx, vy, pid) -> 15 refs
    # outputs: 5 field planes
    (xm, x0, xp, ym, y0, yp, vxm, vx0, vxp, vym, vy0, vyp, pm, p0, pp,
     xo, yo, vxo, vyo, po) = refs
    C = geom.cols_pad
    bs = jnp.float32(geom.bin_size)
    i = pl.program_id(0)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (br, C), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (br, C), 1)
    base_row = i * br

    views = {
        -1: (xm, ym, vxm, vym, pm, base_row + row_iota - 1),
        0: (x0, y0, vx0, vy0, p0, base_row + row_iota),
        1: (xp, yp, vxp, vyp, pp, base_row + row_iota + 1),
    }

    # --- center view: stayers keep slots, leavers vacate -------------------
    cx = [x0[s] for s in range(cap)]
    cy = [y0[s] for s in range(cap)]
    cvx = [vx0[s] for s in range(cap)]
    cvy = [vy0[s] for s in range(cap)]
    cp = [p0[s] for s in range(cap)]
    grow0 = base_row + row_iota
    out_f = [[None] * cap for _ in range(5)]
    stay_mask = []
    for s in range(cap):
        alive = cp[s] >= 0
        dx_, dy_ = _dirs_of(cx[s], cy[s], grow0, col_iota, geom, alive)
        stays = alive & (dx_ == 0) & (dy_ == 0)
        stay_mask.append(stays)
        out_f[0][s] = jnp.where(stays, cx[s], BIG)
        out_f[1][s] = jnp.where(stays, cy[s], BIG)
        out_f[2][s] = jnp.where(stays, cvx[s], 0.0)
        out_f[3][s] = jnp.where(stays, cvy[s], 0.0)
        out_f[4][s] = jnp.where(stays, cp[s], -1)

    # Free-slot rank (exclusive cumsum over slabs). Ranks are carried as
    # float32: Mosaic narrows 0/1-valued int32 vectors back to i1 and then
    # fails to legalize integer equality on i1 vectors; float compares are
    # exact for these small counts and lower cleanly.
    free_rank = []
    running = jnp.zeros((br, C), jnp.float32)
    for s in range(cap):
        free_rank.append(running)
        running = running + jnp.where(out_f[4][s] < 0, 1.0, 0.0)

    # --- entrants: per direction, rank-compact on the source view ---------
    erank = jnp.zeros((br, C), jnp.float32)
    for dr, dc in DIRS:
        if (dr, dc) == (0, 0):
            continue
        # Source bins sit at (-dr, -dc) relative to the destination.
        vx_, vy_ = -dr, -dc
        sxl, syl, svx, svy, spid, sgrow = views[vx_]

        def lane_align(f, fill, dc=dc):
            if dc == 0:
                return f
            out = pltpu.roll(f, dc % C, 1)
            bad = (col_iota == 0) if dc == 1 else (col_iota == C - 1)
            return jnp.where(bad, fill, out)

        # candidate accumulators for this direction
        cand = [
            [jnp.full((br, C), BIG, jnp.float32) for _ in range(evac_cap)],  # xl
            [jnp.full((br, C), BIG, jnp.float32) for _ in range(evac_cap)],  # yl
            [jnp.zeros((br, C), jnp.float32) for _ in range(evac_cap)],      # vx
            [jnp.zeros((br, C), jnp.float32) for _ in range(evac_cap)],      # vy
            [jnp.full((br, C), -1, jnp.int32) for _ in range(evac_cap)],     # pid
        ]
        rank = jnp.zeros((br, C), jnp.float32)
        sgcol = col_iota  # source col iota equals dest col iota pre-roll
        for s in range(cap):
            pid_s = spid[s]
            alive = pid_s >= 0
            dx_, dy_ = _dirs_of(sxl[s], syl[s], sgrow, sgcol, geom, alive)
            mask = alive & (dx_ == dr) & (dy_ == dc)
            xre = sxl[s] - jnp.float32(dr) * bs
            yre = syl[s] - jnp.float32(dc) * bs
            vals = (xre, yre, svx[s], svy[s], pid_s)
            for e in range(evac_cap):
                sel = mask & (rank == jnp.float32(e))
                for fi in range(5):
                    cand[fi][e] = jnp.where(sel, vals[fi], cand[fi][e])
            rank = rank + jnp.where(mask, 1.0, 0.0)

        # shift candidates into the destination frame (lanes only; rows are
        # already aligned by the view choice) and insert by rank matching
        for e in range(evac_cap):
            pid_c = lane_align(cand[4][e], -1)
            xl_c = lane_align(cand[0][e], BIG)
            yl_c = lane_align(cand[1][e], BIG)
            vx_c = lane_align(cand[2][e], 0.0)
            vy_c = lane_align(cand[3][e], 0.0)
            valid = pid_c >= 0
            for s in range(cap):
                sel = valid & (out_f[4][s] < 0) & (erank == free_rank[s])
                out_f[0][s] = jnp.where(sel, xl_c, out_f[0][s])
                out_f[1][s] = jnp.where(sel, yl_c, out_f[1][s])
                out_f[2][s] = jnp.where(sel, vx_c, out_f[2][s])
                out_f[3][s] = jnp.where(sel, vy_c, out_f[3][s])
                out_f[4][s] = jnp.where(sel, pid_c, out_f[4][s])
            erank = erank + jnp.where(valid, 1.0, 0.0)

    for s in range(cap):
        xo[s] = out_f[0][s]
        yo[s] = out_f[1][s]
        vxo[s] = out_f[2][s]
        vyo[s] = out_f[3][s]
        po[s] = out_f[4][s]


def _views(f, fill):
    pad = jnp.pad(f, ((0, 0), (1, 1), (0, 0)), constant_values=fill)
    R = f.shape[1]
    return pad[:, 0:R], pad[:, 1 : R + 1], pad[:, 2 : R + 2]


@functools.partial(jax.jit, static_argnames=("geom", "evac_cap", "interpret"))
def grid_rebin_pallas(state: SlabState, geom: SlabGeometry, evac_cap: int,
                      interpret: bool = False):
    cap = geom.capacity
    R, C = geom.rows_pad, geom.cols_pad
    br = _pick_row_block(geom)

    ins = []
    for f, fill in ((state.xl, BIG), (state.yl, BIG), (state.vx, 0.0),
                    (state.vy, 0.0), (state.pid, -1)):
        ins.extend(_views(f, fill))

    spec = pl.BlockSpec((cap, br, C), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(_rebin_kernel, cap=cap, evac_cap=evac_cap,
                               geom=geom, br=br)
    out_shapes = [jax.ShapeDtypeStruct((cap, R, C), jnp.float32)] * 4 + [
        jax.ShapeDtypeStruct((cap, R, C), jnp.int32)
    ]
    xl, yl, vx, vy, pid = pl.pallas_call(
        kernel,
        grid=(R // br,),
        in_specs=[spec] * 15,
        out_specs=[spec] * 5,
        out_shape=out_shapes,
        interpret=interpret,
    )(*ins)
    new = SlabState(xl, yl, vx, vy, pid)

    # Monitors via XLA reductions (every kernel-side overflow loses a pid).
    before = (state.pid >= 0).astype(jnp.int32).sum()
    occupancy_planes = (pid >= 0).astype(jnp.int32)
    after = occupancy_planes.sum()
    lost = before - after
    # Residual misplacement (a "far" particle clamped to a 1-bin hop, or a
    # boundary-clamped coordinate) shows as |dir| > 0 after rebin.
    inv = jnp.float32(1.0 / geom.bin_size)
    alive = pid >= 0
    misx = alive & (jnp.floor(xl * inv) != 0)
    misy = alive & (jnp.floor(yl * inv) != 0)
    # Boundary bins legitimately hold xl == bin_size (x == size exactly).
    edge_ok_x = alive & (xl >= 0) & (xl <= geom.bin_size * (1 + 1e-6))
    edge_ok_y = alive & (yl >= 0) & (yl <= geom.bin_size * (1 + 1e-6))
    mis = ((misx & ~edge_ok_x) | (misy & ~edge_ok_y)).astype(jnp.int32).sum()
    occupancy = occupancy_planes.sum(axis=0).max()
    return new, RebinMonitors(
        occupancy.astype(jnp.int32), (lost + mis).astype(jnp.int32)
    )
