"""Mosaic (Pallas TPU) kernels for the 3D axis-factorized rebin shuffle.

The 3D analog of the CUDA ``rebinning`` kernel (part3/gpu.cu:92-112) and the
TPU twin of ops/grid3d_ops.grid3_rebin_axes: relocate every one-hop mover
under the loss-free acceptance contract (destination-budget predicate from
shared counts, deterministic -1-before-+1 priority, rejected leavers defer
in place). Three 1-D passes — x, z, then y — exactly the XLA twin's order,
so placements match it decision-for-decision.

Kernel structure (the (capacity, Y, X, Z) slab layout, y the grid axis):

1. **in-plane kernel** — one y-slab per grid step; the x pass (sublane
   rolls) and the z pass (lane rolls) run back-to-back entirely in VMEM —
   no cross-slab data, no intermediate HBM round trip, which is most of the
   win over the XLA path (each XLA pass re-materializes all 7 fields plus
   temporaries; this was the recorded single-chip 3D ceiling at ~8M). The
   y-direction counts of the post-xz state are emitted as a bonus output
   ((3, Y, X, Z): movers-down / alive / movers-up), saving the separate
   counts pass the 2D pipeline needs.
2. **y-pass kernel** — each field enters once as a (cap, 3, X, Z) block
   (slabs y-1..y+1 of a ghost-extended array) and the count stack as a
   (3, 5, X, Z) block (slabs y-2..y+2): the acceptance predicate reads
   counts up to 2 slabs away. Both sides of every transfer evaluate the
   same predicate from the same planes, so neighbor slabs agree without
   atomics or locks (the CUDA path's atomicAdd silently corrupts past
   capacity, gpu.cu:109-111; here backpressure defers and is monitored).

All rank/count arithmetic is float32 (Mosaic narrows 0/1-valued int32
vectors to i1 and integer equality then fails to legalize).

Sharded use: extend every field by 2 ghost y-slabs per side, run both
kernels on the extension, slice the interior — in-plane passes are slab-
local so ghost slabs recompute exactly what the owning shard computes, and
the y pass sees its full +-2 neighborhood (same no-handshake design as
engines/sharded_grid's Mosaic rebin path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ppsim_tpu.ops.binning import BIG
from ppsim_tpu.ops.grid3d_ops import Geometry3S, RebinMonitors, Slab3State, slab3_dirs

__all__ = [
    "grid3_rebin_pallas",
    "rebin3_inplane_pallas",
    "rebin3_ypass_pallas",
]

# Count-plane indices emitted by the in-plane kernel. The fused path
# appends two pre-rebin monitor planes (far movers, alive count) so the
# wrapper's monitors need no extra HBM pass over the slab state; the
# split (beyond-VMEM) path emits only the first three and the wrapper
# falls back to XLA reductions for the pre stats.
_M_MINUS, _ALIVE, _M_PLUS = 0, 1, 2
_FAR_PRE3, _ALIVE_PRE3 = 3, 4
# Post-pass monitor planes emitted by the y-pass kernel.
_ALIVE_POST3, _RESID_POST3 = 0, 1
# (field-list order, fill) shared by both kernels: xl yl zl vx vy vz pid.
_FILLS = (BIG, BIG, BIG, 0.0, 0.0, 0.0, -1)


def _plane_roll(p, d: int, fill, gi, extent: int, axis: int):
    """Plane where element b (along ``axis``) sees p[b + d]; off-array
    elements get ``fill``. Physical edges need no extra mask: padding bins
    hold no alive particles and the direction clamp keeps movers in-grid."""
    if d == 0:
        return p
    out = pltpu.roll(p, (-d) % extent, axis)
    bad = (gi >= extent - d) if d > 0 else (gi < -d)
    return jnp.where(bad, fill, out)


def _dir_of(coord, alive, gi, n_phys, inv):
    """Per-slot 1-D movement direction: one-hop clamp + physical-grid clamp
    (mirrors grid3d_ops.slab3_dirs per axis: clamp first, then zero dead
    slots — padding bins can have inverted clamp bounds but are never
    alive)."""
    d = jnp.clip(jnp.floor(coord * inv).astype(jnp.int32), -1, 1)
    d = jnp.clip(d, -jnp.minimum(gi, 1), jnp.minimum(n_phys - 1 - gi, 1))
    return jnp.where(alive, d, 0)


def _axis_shuffle(planes, axis: int, n_phys: int, geom: Geometry3S,
                  evac_cap: int):
    """One in-plane 1-D pass over a list-of-plane-lists state.

    ``planes``: 7 lists (field order _FILLS) of (X, Z) planes, one per slot.
    ``axis``: 0 = x (sublane rolls), 1 = z (lane rolls). Pure function of
    VMEM-resident values; identical acceptance algebra to
    grid3d_ops._axis_pass (see its docstring for the priority/offset
    derivation and the sign-of-shift trap).
    """
    cap = geom.capacity
    shape = planes[6][0].shape
    extent = shape[axis]
    gi = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
    bs_phys = geom.bsx if axis == 0 else geom.bsz
    inv = jnp.float32(1.0 / bs_phys)
    bs = jnp.float32(bs_phys)
    cap_f = jnp.float32(cap)
    coord_idx = 0 if axis == 0 else 2  # xl for the x pass, zl for the z pass

    def roll(p, d, fill):
        return _plane_roll(p, d, fill, gi, extent, axis)

    alive = [planes[6][s] >= 0 for s in range(cap)]
    dirs = [
        _dir_of(planes[coord_idx][s], alive[s], gi, n_phys, inv)
        for s in range(cap)
    ]

    alive_cnt = jnp.zeros(shape, jnp.float32)
    cnt_m = jnp.zeros(shape, jnp.float32)
    for s in range(cap):
        alive_cnt = alive_cnt + jnp.where(alive[s], 1.0, 0.0)
        cnt_m = cnt_m + jnp.where(alive[s] & (dirs[s] == -1), 1.0, 0.0)
    F = cap_f - alive_cnt
    # off[d] at the SOURCE bin: entrants queued at my destination before my
    # group. -1 has global priority; off[+1][b] = (-1)-movers AT bin b+1.
    off_of = {-1: jnp.zeros(shape, jnp.float32), 1: roll(cnt_m, 1, 0.0)}

    empty = [~alive[s] for s in range(cap)]
    empty_rank = []
    running = jnp.zeros(shape, jnp.float32)
    for s in range(cap):
        empty_rank.append(running)
        running = running + jnp.where(empty[s], 1.0, 0.0)

    outs = [list(f) for f in planes]
    for d in (-1, 1):
        # -- source side: clear my accepted leavers ----------------------
        off_at_dest = roll(off_of[d], d, 0.0)
        F_at_dest = roll(F, d, 0.0)
        rank = jnp.zeros(shape, jnp.float32)
        for s in range(cap):
            mj = alive[s] & (dirs[s] == d)
            accj = mj & (rank < float(evac_cap)) & (off_at_dest + rank < F_at_dest)
            for k in range(7):
                outs[k][s] = jnp.where(accj, _FILLS[k], outs[k][s])
            rank = rank + jnp.where(mj, 1.0, 0.0)

        # -- destination side: pull group d from the source at -d --------
        # The source's predicate evaluated in MY frame: its off/F at dest
        # are exactly my off_of[d] / F.
        srank = jnp.zeros(shape, jnp.float32)
        for s in range(cap):
            spid = roll(planes[6][s], -d, -1)
            salive = spid >= 0
            scoord = roll(planes[coord_idx][s], -d, BIG)
            sdir = _dir_of(scoord, salive, gi - d, n_phys, inv)
            mjs = salive & (sdir == d)
            accj = mjs & (srank < float(evac_cap)) & (off_of[d] + srank < F)
            idx = off_of[d] + srank
            sfields = [
                roll(planes[k][s], -d, _FILLS[k]) for k in range(6)
            ]
            sfields[coord_idx] = scoord - jnp.float32(d) * bs
            for t in range(cap):
                sel = accj & empty[t] & (empty_rank[t] == idx)
                for k in range(6):
                    outs[k][t] = jnp.where(sel, sfields[k], outs[k][t])
                outs[6][t] = jnp.where(sel, spid, outs[6][t])
            srank = srank + jnp.where(mjs, 1.0, 0.0)
    return outs


def _emit_ycounts(planes, yoff_ref, cnt_ref, cap, geom: Geometry3S):
    """Write the (3,) y-direction count planes of ``planes`` (the y pass's
    acceptance inputs). The y clamp is a scalar: every bin in a slab shares
    gy."""
    i = pl.program_id(0)
    inv = jnp.float32(1.0 / geom.bsy)
    gy = yoff_ref[i, 0]
    shape = planes[6][0].shape
    lo = -jnp.minimum(gy, 1)
    hi = jnp.minimum(geom.ys - 1 - gy, 1)
    cm = jnp.zeros(shape, jnp.float32)
    ca = jnp.zeros(shape, jnp.float32)
    cp = jnp.zeros(shape, jnp.float32)
    for s in range(cap):
        alive = planes[6][s] >= 0
        dy = jnp.clip(jnp.floor(planes[1][s] * inv).astype(jnp.int32), -1, 1)
        dy = jnp.where(alive, jnp.clip(dy, lo, hi), 0)
        cm = cm + jnp.where(alive & (dy == -1), 1.0, 0.0)
        ca = ca + jnp.where(alive, 1.0, 0.0)
        cp = cp + jnp.where(alive & (dy == 1), 1.0, 0.0)
    cnt_ref[_M_MINUS, 0] = cm
    cnt_ref[_ALIVE, 0] = ca
    cnt_ref[_M_PLUS, 0] = cp


def _emit_prestats(planes, cnt_ref, cap, geom: Geometry3S):
    """Write the PRE-rebin monitor planes [far_pre, alive_pre]: far movers
    are raw >1-bin drifts on ANY axis (matches grid3d_ops.slab3_dirs — the
    slack-violation signal must be read before the one-hop clamps move the
    particle, ADVICE-class fix)."""
    invx = jnp.float32(1.0 / geom.bsx)
    invy = jnp.float32(1.0 / geom.bsy)
    invz = jnp.float32(1.0 / geom.bsz)
    shape = planes[6][0].shape
    fp = jnp.zeros(shape, jnp.float32)
    ap = jnp.zeros(shape, jnp.float32)
    for s in range(cap):
        alive = planes[6][s] >= 0
        rx = jnp.floor(planes[0][s] * invx).astype(jnp.int32)
        ry = jnp.floor(planes[1][s] * invy).astype(jnp.int32)
        rz = jnp.floor(planes[2][s] * invz).astype(jnp.int32)
        far = alive & ((jnp.abs(rx) > 1) | (jnp.abs(ry) > 1) | (jnp.abs(rz) > 1))
        fp = fp + jnp.where(far, 1.0, 0.0)
        ap = ap + jnp.where(alive, 1.0, 0.0)
    cnt_ref[_FAR_PRE3, 0] = fp
    cnt_ref[_ALIVE_PRE3, 0] = ap


def _xpass_kernel(*refs, cap, evac_cap, geom: Geometry3S):
    # One y-slab x one Z-chunk per grid step; the x pass's dependencies run
    # only along x (full in the block), so Z tiles freely.
    in_refs, out_refs = refs[:7], refs[7:14]
    planes = [[in_refs[k][s, 0] for s in range(cap)] for k in range(7)]
    planes = _axis_shuffle(planes, 0, geom.xs, geom, evac_cap)
    for k in range(7):
        for s in range(cap):
            out_refs[k][s, 0] = planes[k][s]


def _zpass_kernel(yoff_ref, *refs, cap, evac_cap, geom: Geometry3S):
    # One y-slab x one X-chunk per grid step; z dependencies run only along
    # z (full in the block). Emits the y-direction counts of the result.
    in_refs, out_refs, cnt_ref = refs[:7], refs[7:14], refs[14]
    planes = [[in_refs[k][s, 0] for s in range(cap)] for k in range(7)]
    planes = _axis_shuffle(planes, 1, geom.zs, geom, evac_cap)
    _emit_ycounts(planes, yoff_ref, cnt_ref, cap, geom)
    for k in range(7):
        for s in range(cap):
            out_refs[k][s, 0] = planes[k][s]


def _chunk_of(total: int, unit: int, width: int, budget: int) -> int:
    """Largest divisor of ``total`` that is a multiple of ``unit`` with
    chunk_bytes = d * width * 4 <= budget (falls back to ``unit``)."""
    best = unit
    d = unit
    while d <= total:
        if total % d == 0 and d * width * 4 <= budget:
            best = d
        d += unit
    return best


# Above this (X, Z) plane size the fused x+z kernel's VMEM stack outgrows
# the chip (measured: 168x256 = 172KB planes at the UNSNAPPED n=16.8M
# geometry want ~140MB of 128MB; VMEM need scales with plane bytes, so
# ~112KB planes fit). The split path tiles each pass along its
# dependency-free axis instead, paying one extra state round trip per
# rebin. The lane-snapped geometries keep planes at (X_pad, 128) — 98KB
# at n=16.8M, 106KB at 20.97M — so every benchmark size now runs fused;
# the split path remains the beyond-VMEM fallback. (It is also suspected
# of an intermittent TPU-worker fault at 16.8M — three full-run crashes,
# zero on the fused path — another reason the threshold sits just above
# the largest single-chip size.)
_FUSE_LIMIT_BYTES = 112 * 1024
_CHUNK_BUDGET = 72 * 1024


def _inplane_kernel(yoff_ref, *refs, cap, evac_cap, geom: Geometry3S):
    in_refs, out_refs, cnt_ref = refs[:7], refs[7:14], refs[14]
    planes = [[in_refs[k][s, 0] for s in range(cap)] for k in range(7)]
    _emit_prestats(planes, cnt_ref, cap, geom)
    planes = _axis_shuffle(planes, 0, geom.xs, geom, evac_cap)
    planes = _axis_shuffle(planes, 1, geom.zs, geom, evac_cap)
    _emit_ycounts(planes, yoff_ref, cnt_ref, cap, geom)
    for k in range(7):
        for s in range(cap):
            out_refs[k][s, 0] = planes[k][s]


def _ypass_kernel(yoff_ref, *refs, cap, evac_cap, geom: Geometry3S):
    # inputs: per field 3 single-slab views (y-1, y, y+1) -> 21 refs, then
    # 5 single-slab count views (y-2 .. y+2); outputs: 7 field refs (slab
    # y) + the (2,) post-pass monitor planes [alive_post, residual_movers].
    f_refs, c_refs = refs[:21], refs[21:26]
    out_refs, post_ref = refs[26:33], refs[33]
    i = pl.program_id(0)
    gy = yoff_ref[i, 0]
    inv = jnp.float32(1.0 / geom.bsy)
    bs = jnp.float32(geom.bsy)
    cap_f = jnp.float32(geom.capacity)

    def fplane(k, s, dy):
        return f_refs[3 * k + dy + 1][s, 0]

    def cnt(which, dy):
        return c_refs[dy + 2][which, 0]

    def dy_of(yl, alive, slab_gy):
        d = jnp.clip(jnp.floor(yl * inv).astype(jnp.int32), -1, 1)
        lo = -jnp.minimum(slab_gy, 1)
        hi = jnp.minimum(geom.ys - 1 - slab_gy, 1)
        return jnp.where(alive, jnp.clip(d, lo, hi), 0)

    shape = f_refs[6].shape[2:]
    F0 = cap_f - cnt(_ALIVE, 0)
    # off[d] in MY (destination) frame: entrants queued before group d =
    # the -1 stream I receive, counted at my upper neighbor.
    off = {-1: jnp.zeros(shape, jnp.float32), 1: cnt(_M_MINUS, 1)}

    outs = [[fplane(k, s, 0) for s in range(cap)] for k in range(7)]
    alive0 = [outs[6][s] >= 0 for s in range(cap)]
    dy0 = [dy_of(outs[1][s], alive0[s], gy) for s in range(cap)]

    empty = [~alive0[s] for s in range(cap)]
    empty_rank = []
    running = jnp.zeros(shape, jnp.float32)
    for s in range(cap):
        empty_rank.append(running)
        running = running + jnp.where(empty[s], 1.0, 0.0)

    for d in (-1, 1):
        # -- source side: clear my accepted leavers ----------------------
        # off at my destination slab: 0 for the -1 stream; for +1 it is the
        # (-1)-movers at slab gy+2.
        off_at_dest = (
            jnp.zeros(shape, jnp.float32) if d == -1 else cnt(_M_MINUS, 2)
        )
        F_at_dest = cap_f - cnt(_ALIVE, d)
        rank = jnp.zeros(shape, jnp.float32)
        for s in range(cap):
            mj = alive0[s] & (dy0[s] == d)
            accj = mj & (rank < float(evac_cap)) & (off_at_dest + rank < F_at_dest)
            for k in range(7):
                outs[k][s] = jnp.where(accj, _FILLS[k], outs[k][s])
            rank = rank + jnp.where(mj, 1.0, 0.0)

        # -- destination side: entrants of group d from slab -d ----------
        srank = jnp.zeros(shape, jnp.float32)
        for s in range(cap):
            spid = fplane(6, s, -d)
            salive = spid >= 0
            syl = fplane(1, s, -d)
            sdy = dy_of(syl, salive, gy - d)
            mjs = salive & (sdy == d)
            accj = mjs & (srank < float(evac_cap)) & (off[d] + srank < F0)
            idx = off[d] + srank
            sfields = [fplane(k, s, -d) for k in range(6)]
            sfields[1] = syl - jnp.float32(d) * bs
            for t in range(cap):
                sel = accj & empty[t] & (empty_rank[t] == idx)
                for k in range(6):
                    outs[k][t] = jnp.where(sel, sfields[k], outs[k][t])
                outs[6][t] = jnp.where(sel, spid, outs[6][t])
            srank = srank + jnp.where(mjs, 1.0, 0.0)

    # post-pass monitor planes: settled occupancy + residual movers (the
    # post-hoc deferred definition shared by every rebin variant). The
    # grid tiles X, so the x index must be globalized for the dir clamp.
    xi = (pl.program_id(1) * shape[0]
          + jax.lax.broadcasted_iota(jnp.int32, shape, 0))
    zi = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    invx = jnp.float32(1.0 / geom.bsx)
    invz = jnp.float32(1.0 / geom.bsz)
    ap = jnp.zeros(shape, jnp.float32)
    rp = jnp.zeros(shape, jnp.float32)
    for s in range(cap):
        af = outs[6][s] >= 0
        dxp = _dir_of(outs[0][s], af, xi, geom.xs, invx)
        dyp = dy_of(outs[1][s], af, gy)
        dzp = _dir_of(outs[2][s], af, zi, geom.zs, invz)
        ap = ap + jnp.where(af, 1.0, 0.0)
        rp = rp + jnp.where(af & ((dxp != 0) | (dyp != 0) | (dzp != 0)),
                            1.0, 0.0)
    post_ref[_ALIVE_POST3, 0] = ap
    post_ref[_RESID_POST3, 0] = rp

    for k in range(7):
        for s in range(cap):
            out_refs[k][s, 0] = outs[k][s]


@functools.partial(jax.jit, static_argnames=("geom", "evac_cap", "interpret",
                                             "fuse_limit"))
def rebin3_inplane_pallas(state: Slab3State, geom: Geometry3S, evac_cap: int,
                          interpret: bool = False, y0=None,
                          fuse_limit: int = _FUSE_LIMIT_BYTES):
    """x pass + z pass, plus the y-direction count planes of the result.
    Returns ``(Slab3State, counts (3, Y, X, Z) float32)``.

    Small (X, Z) planes run both passes fused in one kernel (no state round
    trip between them); past ``fuse_limit`` plane bytes the passes split
    into two kernels, each tiling the axis it has no dependencies along, so
    VMEM stays bounded at any problem size."""
    cap = geom.capacity
    Y = state.xl.shape[1]
    Xp, Zp = state.xl.shape[2], state.xl.shape[3]
    base = 0 if y0 is None else y0
    yoff = (base + jnp.arange(Y, dtype=jnp.int32))[:, None]
    f32 = jnp.float32
    params = pltpu.CompilerParams(vmem_limit_bytes=127 * 1024 * 1024)
    field_shapes = (
        [jax.ShapeDtypeStruct((cap, Y, Xp, Zp), f32)] * 6
        + [jax.ShapeDtypeStruct((cap, Y, Xp, Zp), jnp.int32)]
    )
    cnt_shape = jax.ShapeDtypeStruct((3, Y, Xp, Zp), f32)

    if Xp * Zp * 4 <= fuse_limit:
        cnt_shape = jax.ShapeDtypeStruct((5, Y, Xp, Zp), f32)
        main = pl.BlockSpec((cap, 1, Xp, Zp), lambda i: (0, i, 0, 0),
                            memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((5, 1, Xp, Zp), lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM)
        yspec = pl.BlockSpec((Y, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
        out = pl.pallas_call(
            functools.partial(_inplane_kernel, cap=cap, evac_cap=evac_cap,
                              geom=geom),
            grid=(Y,),
            in_specs=[yspec] + [main] * 7,
            out_specs=[main] * 7 + [cspec],
            out_shape=field_shapes + [cnt_shape],
            interpret=interpret,
            compiler_params=params,
        )(yoff, *state)
        return Slab3State(*out[:7]), out[7]

    # ---- split path: x pass over Z-chunks, then z pass over X-chunks ----
    zc = _chunk_of(Zp, 128, Xp, _CHUNK_BUDGET)
    xspec = pl.BlockSpec((cap, 1, Xp, zc), lambda i, j: (0, i, 0, j),
                         memory_space=pltpu.VMEM)
    mid = pl.pallas_call(
        functools.partial(_xpass_kernel, cap=cap, evac_cap=evac_cap,
                          geom=geom),
        grid=(Y, Zp // zc),
        in_specs=[xspec] * 7,
        out_specs=[xspec] * 7,
        out_shape=field_shapes,
        interpret=interpret,
        compiler_params=params,
    )(*state)

    xc = _chunk_of(Xp, 8, Zp, _CHUNK_BUDGET)
    zspec = pl.BlockSpec((cap, 1, xc, Zp), lambda i, j: (0, i, j, 0),
                         memory_space=pltpu.VMEM)
    czspec = pl.BlockSpec((3, 1, xc, Zp), lambda i, j: (0, i, j, 0),
                          memory_space=pltpu.VMEM)
    yspec2 = pl.BlockSpec((Y, 1), lambda i, j: (0, 0),
                          memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        functools.partial(_zpass_kernel, cap=cap, evac_cap=evac_cap,
                          geom=geom),
        grid=(Y, Xp // xc),
        in_specs=[yspec2] + [zspec] * 7,
        out_specs=[zspec] * 7 + [czspec],
        out_shape=field_shapes + [cnt_shape],
        interpret=interpret,
        compiler_params=params,
    )(yoff, *mid)
    return Slab3State(*out[:7]), out[7]


@functools.partial(jax.jit, static_argnames=("geom", "evac_cap", "interpret"))
def rebin3_ypass_pallas(state: Slab3State, counts, geom: Geometry3S,
                        evac_cap: int, interpret: bool = False, y0=None):
    """The cross-slab y pass. Fields are ghost-extended by 1 fill slab per
    side (the caller's array may itself already carry real neighbor ghost
    slabs — sharded use), counts by 2; each field enters the kernel ONCE as
    a 3-slab-tall block. Returns ``(Slab3State, post)`` where ``post`` is
    the (2, Y, X, Z) [alive_post, residual_movers] monitor stack (reduce
    instead of re-reading the slab state; sharded callers slice their
    owned slabs first). ``counts`` may carry the fused path's extra
    pre-stat planes — the kernel reads only the first three."""
    cap = geom.capacity
    Y = state.xl.shape[1]
    Xp, Zp = state.xl.shape[2], state.xl.shape[3]
    base = 0 if y0 is None else y0
    yoff = (base + jnp.arange(Y, dtype=jnp.int32))[:, None]

    exts = []
    for k, f in enumerate(state):
        g = jnp.full((cap, 1, Xp, Zp), _FILLS[k], f.dtype)
        exts.append(jnp.concatenate([g, f, g], axis=1))
    gc = jnp.zeros((counts.shape[0], 2, Xp, Zp), jnp.float32)
    cext = jnp.concatenate([gc, counts, gc], axis=1)

    # Overlapping slab windows: BlockSpec index_maps are in BLOCK units, so
    # a 3-slab block cannot slide by one slab — instead each ext array is
    # passed once per window offset with a 1-slab block (same HBM buffer,
    # no host-side duplication; each slab is fetched 3x/5x across the grid,
    # the same traffic the 2D row-view design pays). The grid also tiles X
    # (y decisions are per-(x, z) element), bounding VMEM at any size.
    xc = _chunk_of(Xp, 8, Zp, _CHUNK_BUDGET)

    def slab_spec(off):
        return pl.BlockSpec((cap, 1, xc, Zp),
                            lambda i, j, off=off: (0, i + off, j, 0),
                            memory_space=pltpu.VMEM)

    def cnt_spec(off):
        return pl.BlockSpec((3, 1, xc, Zp),
                            lambda i, j, off=off: (0, i + off, j, 0),
                            memory_space=pltpu.VMEM)

    main = pl.BlockSpec((cap, 1, xc, Zp), lambda i, j: (0, i, j, 0),
                        memory_space=pltpu.VMEM)
    yspec = pl.BlockSpec((Y, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    out_shapes = (
        [jax.ShapeDtypeStruct((cap, Y, Xp, Zp), jnp.float32)] * 6
        + [jax.ShapeDtypeStruct((cap, Y, Xp, Zp), jnp.int32)]
        + [jax.ShapeDtypeStruct((2, Y, Xp, Zp), jnp.float32)]
    )
    post_spec = pl.BlockSpec((2, 1, xc, Zp), lambda i, j: (0, i, j, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [yspec]
    ins = [yoff]
    for ext in exts:
        for off in range(3):
            in_specs.append(slab_spec(off))
            ins.append(ext)
    for off in range(5):
        in_specs.append(cnt_spec(off))
        ins.append(cext)
    out = pl.pallas_call(
        functools.partial(_ypass_kernel, cap=cap, evac_cap=evac_cap,
                          geom=geom),
        grid=(Y, Xp // xc),
        in_specs=in_specs,
        out_specs=[main] * 7 + [post_spec],
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
    )(yoff, *ins[1:])
    return Slab3State(*out[:7]), out[7]


@functools.partial(jax.jit, static_argnames=("geom", "evac_cap", "interpret"))
def grid3_rebin_pallas(state: Slab3State, geom: Geometry3S, evac_cap: int,
                       interpret: bool = False):
    """Single-chip Mosaic 3D rebin: fused xz pass + y pass + monitors
    (same contract as grid3d_ops.grid3_rebin_axes). The monitors reduce
    the kernels' emitted count planes — the fused path pays no extra HBM
    pass over the slab state; only the split (beyond-VMEM) fallback still
    computes its pre-rebin stats with XLA reductions."""
    mid, counts = rebin3_inplane_pallas(state, geom, evac_cap,
                                        interpret=interpret)
    new, post = rebin3_ypass_pallas(mid, counts, geom, evac_cap,
                                    interpret=interpret)

    # int32 BEFORE the sums: per-bin counts are small exact floats, but an
    # f32 SUM loses integer exactness past 2^24 (< the 20.97M stretch n)
    post = post.astype(jnp.int32)
    if counts.shape[0] > _FAR_PRE3:  # fused path: pre stats in the stack
        far_n = counts[_FAR_PRE3].astype(jnp.int32).sum()
        alive0 = counts[_ALIVE_PRE3].astype(jnp.int32).sum()
    else:  # split fallback: pre stats via XLA over the input state
        _, _, _, far0, _ = slab3_dirs(state, geom)
        far_n = far0.astype(jnp.int32).sum()
        alive0 = (state.pid >= 0).astype(jnp.int32).sum()

    occupancy = post[_ALIVE_POST3].max()
    lost = alive0 - post[_ALIVE_POST3].sum()
    deferred = post[_RESID_POST3].sum()
    return new, RebinMonitors(occupancy, lost + far_n, deferred)
