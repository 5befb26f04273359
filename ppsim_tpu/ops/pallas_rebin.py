"""Mosaic (Pallas TPU) kernels for the loss-free slab-grid rebin shuffle.

Two variants, selected by ``SimConfig.grid_rebin_mode``:

- **dirs9** (grid_rebin_pallas): the 9-direction shuffle, two kernels
  (counts + shuffle), twin of grid_ops.grid_rebin.
- **axes** (grid_rebin_axes_pallas): the axis-factorized form, ONE fused
  kernel (rows pass from row views, cols pass lane-local) emitting monitor
  count planes — twin of grid_ops.grid_rebin_axes and the 2D port of the
  3D design in pallas_rebin3.

The dirs9 pipeline's two passes (algorithm identical to the XLA twin,
grid_ops.grid_rebin — see its docstring for the acceptance-predicate
design):

1. **counts kernel** — per bin: alive count and per-direction leaver counts,
   emitted as a (9, R, C) float32 plane stack (index = DIRS order, index 4 =
   alive count).
2. **shuffle kernel** — consumes 3-row views of the 5 field arrays plus
   5-row views of the count stack (the acceptance predicate reads counts up
   to 2 bins away), moves accepted leavers, defers the rest in place.

The CUDA engine resolves rebin conflicts with ``atomicAdd`` (part3/gpu.cu:
92-112) and silently corrupts past capacity (gpu.cu:109-111); the OpenMP
engine locks every bin (part1/openmp.cpp:170-177). Here both sides of every
transfer evaluate the same deterministic budget predicate from shared count
planes, so there is nothing to lock and nothing to drop.

All rank/count arithmetic is carried in float32: Mosaic narrows 0/1-valued
int32 vectors to i1 and then cannot legalize integer equality on them; float
compares are exact for these small counts and lower cleanly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ppsim_tpu.ops.binning import BIG
from ppsim_tpu.ops.grid_ops import DIRS, RebinMonitors, SlabGeometry, SlabState

__all__ = [
    "grid_rebin_pallas",
    "rebin_counts_pallas",
    "rebin_shuffle_pallas",
    "grid_rebin_axes_pallas",
    "rebin_axes_call_pallas",
]

# Conservative: Mosaic pads small sublane dims to tile boundaries and keeps
# many live temporaries on the VMEM stack, so real usage runs well past the
# raw I/O-block estimate (observed ~3.5x at capacity 12).
_VMEM_BUDGET = 4 * 1024 * 1024


def _pick_row_block(geom: SlabGeometry, nplanes: int, rows: int) -> int:
    # Mosaic requires the block's second-minor dim divisible by 8 (or the
    # full dimension); rely on a raised scoped-vmem limit instead of
    # sub-8 blocks.
    return 8 if rows % 8 == 0 else rows


def _dirs_of(xl, yl, grow, gcol, geom: SlabGeometry, alive):
    """Per-slab direction components with physical-boundary clamping.

    ``grow``/``gcol`` are the global row/col index planes of this view.
    Matches grid_ops.slab_dirs exactly.
    """
    inv = jnp.float32(1.0 / geom.bin_size)
    dirx = jnp.clip(jnp.floor(xl * inv).astype(jnp.int32), -1, 1)
    diry = jnp.clip(jnp.floor(yl * inv).astype(jnp.int32), -1, 1)
    # Clamp first, THEN zero dead slots — same order as grid_ops.slab_dirs,
    # so dead slots are exactly 0 even in padded rows/cols (where the clamp
    # bounds can be negative).
    dirx = jnp.clip(dirx, -jnp.minimum(grow, 1), jnp.minimum(geom.rows - 1 - grow, 1))
    diry = jnp.clip(diry, -jnp.minimum(gcol, 1), jnp.minimum(geom.cols - 1 - gcol, 1))
    dirx = jnp.where(alive, dirx, 0)
    diry = jnp.where(alive, diry, 0)
    return dirx, diry


def _lane_shift(f, dc: int, fill, col_iota, cols: int):
    """Plane shifted so element c reads f[c + dc]; OOB lanes get fill."""
    if dc == 0:
        return f
    out = pltpu.roll(f, (-dc) % cols, 1)
    if dc > 0:
        bad = col_iota >= cols - dc
    else:
        bad = col_iota < -dc
    return jnp.where(bad, fill, out)


# ---------------------------------------------------------------- pass 1
def _counts_kernel(x0, y0, p0, grow_ref, out, *, cap, geom: SlabGeometry, br):
    C = geom.cols_pad
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (br, C), 1)
    grow = grow_ref[...]

    planes = [jnp.zeros((br, C), jnp.float32) for _ in range(9)]
    for s in range(cap):
        alive = p0[s] >= 0
        dx_, dy_ = _dirs_of(x0[s], y0[s], grow, col_iota, geom, alive)
        planes[4] = planes[4] + jnp.where(alive, 1.0, 0.0)
        for d, (dr, dc) in enumerate(DIRS):
            if (dr, dc) == (0, 0):
                continue
            m = alive & (dx_ == dr) & (dy_ == dc)
            planes[d] = planes[d] + jnp.where(m, 1.0, 0.0)
    for d in range(9):
        out[d] = planes[d]


# ---------------------------------------------------------------- pass 2
def _shuffle_kernel(*refs, cap, evac_cap, geom: SlabGeometry, br):
    # inputs: xl/yl/vx/vy/pid x 3 row-views (15) + counts x 5 row-views (5)
    # outputs: 5 field planes
    (xm, x0, xp, ym, y0, yp, vxm, vx0, vxp, vym, vy0, vyp, pm, p0, pp,
     cm2, cm1, c0, cp1, cp2, grow_ref,
     xo, yo, vxo, vyo, po) = refs
    C = geom.cols_pad
    bs = jnp.float32(geom.bin_size)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (br, C), 1)
    grow0 = grow_ref[...]

    cviews = {-2: cm2, -1: cm1, 0: c0, 1: cp1, 2: cp2}
    fviews = {
        -1: (xm, ym, vxm, vym, pm, grow0 - 1),
        0: (x0, y0, vx0, vy0, p0, grow0),
        1: (xp, yp, vxp, vyp, pp, grow0 + 1),
    }

    def cnt(d_idx: int, dr: int, dc: int):
        """Count plane d_idx of the bin at offset (dr, dc); OOB -> 0."""
        return _lane_shift(cviews[dr][d_idx], dc, 0.0, col_iota, C)

    cap_f = jnp.float32(geom.capacity)
    # off[d] anchored at the DESTINATION: entrants queued before group d.
    F0 = cap_f - cnt(4, 0, 0)
    off = {}
    acc = jnp.zeros((br, C), jnp.float32)
    for d, (dr, dc) in enumerate(DIRS):
        if (dr, dc) == (0, 0):
            continue
        off[d] = acc
        acc = acc + cnt(d, -dr, -dc)

    # center state starts unchanged (stayers + provisionally-deferred leavers)
    out_x = [x0[s] for s in range(cap)]
    out_y = [y0[s] for s in range(cap)]
    out_vx = [vx0[s] for s in range(cap)]
    out_vy = [vy0[s] for s in range(cap)]
    out_p = [p0[s] for s in range(cap)]

    # pre-rebin emptiness of the center bin (entrants use only these slots)
    empty = [p0[s] < 0 for s in range(cap)]
    empty_rank = []
    running = jnp.zeros((br, C), jnp.float32)
    for s in range(cap):
        empty_rank.append(running)
        running = running + jnp.where(empty[s], 1.0, 0.0)

    for d, (dr, dc) in enumerate(DIRS):
        if (dr, dc) == (0, 0):
            continue
        # ---- source side: clear accepted leavers from the center --------
        # off_d and F at my destination (offset +d): counts live at
        # offsets d - d' (within the 2-ring) from me.
        off_at_dest = jnp.zeros((br, C), jnp.float32)
        for dp, (dpr, dpc) in enumerate(DIRS):
            if dp >= d:
                break
            if (dpr, dpc) == (0, 0):
                continue
            off_at_dest = off_at_dest + cnt(dp, dr - dpr, dc - dpc)
        F_at_dest = cap_f - cnt(4, dr, dc)

        rank = jnp.zeros((br, C), jnp.float32)
        for s in range(cap):
            alive = p0[s] >= 0
            dx_, dy_ = _dirs_of(x0[s], y0[s], grow0, col_iota, geom, alive)
            mj = alive & (dx_ == dr) & (dy_ == dc)
            accj = mj & (rank < float(evac_cap)) & (off_at_dest + rank < F_at_dest)
            out_x[s] = jnp.where(accj, BIG, out_x[s])
            out_y[s] = jnp.where(accj, BIG, out_y[s])
            out_vx[s] = jnp.where(accj, 0.0, out_vx[s])
            out_vy[s] = jnp.where(accj, 0.0, out_vy[s])
            out_p[s] = jnp.where(accj, -1, out_p[s])
            rank = rank + jnp.where(mj, 1.0, 0.0)

        # ---- destination side: pull group d from the source at -d -------
        sxl, syl, svx, svy, spid, sgrow = fviews[-dr]
        # The source's acceptance predicate, evaluated in MY frame (its
        # destination is me): off[d] and F0 are exactly its off/F at dest.
        srank = jnp.zeros((br, C), jnp.float32)
        for s in range(cap):
            spid_s = _lane_shift(spid[s], -dc, -1, col_iota, C)
            salive = spid_s >= 0
            sxl_s = _lane_shift(sxl[s], -dc, BIG, col_iota, C)
            syl_s = _lane_shift(syl[s], -dc, BIG, col_iota, C)
            sgcol = col_iota - dc  # source's own column index
            sdx, sdy = _dirs_of(sxl_s, syl_s, sgrow, sgcol, geom, salive)
            mj = salive & (sdx == dr) & (sdy == dc)
            accj = mj & (srank < float(evac_cap)) & (off[d] + srank < F0)
            idx = off[d] + srank
            svx_s = _lane_shift(svx[s], -dc, 0.0, col_iota, C)
            svy_s = _lane_shift(svy[s], -dc, 0.0, col_iota, C)
            xre = sxl_s - jnp.float32(dr) * bs
            yre = syl_s - jnp.float32(dc) * bs
            for t in range(cap):
                sel = accj & empty[t] & (empty_rank[t] == idx)
                out_x[t] = jnp.where(sel, xre, out_x[t])
                out_y[t] = jnp.where(sel, yre, out_y[t])
                out_vx[t] = jnp.where(sel, svx_s, out_vx[t])
                out_vy[t] = jnp.where(sel, svy_s, out_vy[t])
                out_p[t] = jnp.where(sel, spid_s, out_p[t])
            srank = srank + jnp.where(mj, 1.0, 0.0)

    for s in range(cap):
        xo[s] = out_x[s]
        yo[s] = out_y[s]
        vxo[s] = out_vx[s]
        vyo[s] = out_vy[s]
        po[s] = out_p[s]


def _views(f, fill, halo: int, ghost_top=None, ghost_bot=None):
    cap_or_k, R, C = f.shape
    if ghost_top is None:
        ghost_top = jnp.full((cap_or_k, halo, C), fill, f.dtype)
    if ghost_bot is None:
        ghost_bot = jnp.full((cap_or_k, halo, C), fill, f.dtype)
    ext = jnp.concatenate([ghost_top, f, ghost_bot], axis=1)
    return [ext[:, o : o + R] for o in range(2 * halo + 1)]


@functools.partial(jax.jit, static_argnames=("geom", "interpret"))
def rebin_counts_pallas(state: SlabState, geom: SlabGeometry,
                        interpret: bool = False, row0=None):
    """Pass 1: (9, R, C) count planes (index 4 = alive count A)."""
    cap = state.xl.shape[0]
    R, C = state.xl.shape[1], geom.cols_pad
    br1 = _pick_row_block(geom, nplanes=3 * cap + 10, rows=R)
    base = 0 if row0 is None else row0
    grow = base + jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
    spec1 = pl.BlockSpec((cap, br1, C), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    gspec1 = pl.BlockSpec((br1, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cspec1 = pl.BlockSpec((9, br1, C), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_counts_kernel, cap=cap, geom=geom, br=br1),
        grid=(R // br1,),
        in_specs=[spec1] * 3 + [gspec1],
        out_specs=cspec1,
        out_shape=jax.ShapeDtypeStruct((9, R, C), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(state.xl, state.yl, state.pid, grow)


@functools.partial(jax.jit, static_argnames=("geom", "evac_cap", "interpret"))
def rebin_shuffle_pallas(state: SlabState, counts, geom: SlabGeometry,
                         evac_cap: int, interpret: bool = False, row0=None,
                         field_ghosts=None, count_ghosts=None) -> SlabState:
    """Pass 2: the shuffle itself. ``field_ghosts``: optional per-field
    (top, bot) 1-row blocks in (xl, yl, vx, vy, pid) order; ``count_ghosts``:
    optional (top, bot) 2-row blocks of the count stack."""
    cap = state.xl.shape[0]
    R, C = state.xl.shape[1], geom.cols_pad
    br = _pick_row_block(geom, nplanes=20 * cap + 56, rows=R)
    base = 0 if row0 is None else row0
    grow = base + jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)

    spec = pl.BlockSpec((cap, br, C), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((br, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((9, br, C), lambda i: (0, i, 0), memory_space=pltpu.VMEM)

    fields = ((state.xl, BIG), (state.yl, BIG), (state.vx, 0.0),
              (state.vy, 0.0), (state.pid, -1))
    ins = []
    for fi, (f, fill) in enumerate(fields):
        gt = gb = None
        if field_ghosts is not None:
            gt, gb = field_ghosts[fi]
        ins.extend(_views(f, fill, 1, gt, gb))
    ct = cb = None
    if count_ghosts is not None:
        ct, cb = count_ghosts
    ins.extend(_views(counts, 0.0, 2, ct, cb))
    ins.append(grow)

    out_shapes = [jax.ShapeDtypeStruct((cap, R, C), jnp.float32)] * 4 + [
        jax.ShapeDtypeStruct((cap, R, C), jnp.int32)
    ]
    xl, yl, vx, vy, pid = pl.pallas_call(
        functools.partial(_shuffle_kernel, cap=cap, evac_cap=evac_cap,
                          geom=geom, br=br),
        grid=(R // br,),
        in_specs=[spec] * 15 + [cspec] * 5 + [gspec],
        out_specs=[spec] * 5,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*ins)
    return SlabState(xl, yl, vx, vy, pid)


@functools.partial(jax.jit, static_argnames=("geom", "evac_cap", "interpret"))
def grid_rebin_pallas(state: SlabState, geom: SlabGeometry, evac_cap: int,
                      interpret: bool = False):
    """Single-chip rebin: counts + shuffle + monitors."""
    counts = rebin_counts_pallas(state, geom, interpret=interpret)
    new = rebin_shuffle_pallas(state, counts, geom, evac_cap, interpret=interpret)

    # Monitors via XLA reductions. Deferred leavers still show a nonzero
    # direction after the shuffle; any structural loss shows in the count.
    before = (state.pid >= 0).astype(jnp.int32).sum()
    occupancy_planes = (new.pid >= 0).astype(jnp.int32)
    after = occupancy_planes.sum()
    lost = before - after
    from ppsim_tpu.ops.grid_ops import slab_dirs

    # far movers must be flagged on the PRE-rebin state: the shuffle clamps
    # to one hop, so a 2-bin drifter (fatal stale-slack violation) looks
    # like a benign 1-bin mover afterwards (same fix grid3_rebin_axes got
    # in round 3; the XLA twin grid_rebin always flagged pre).
    _, _, far0, _ = slab_dirs(state, geom)
    dirx, diry, _, alive2 = slab_dirs(new, geom)
    deferred = ((alive2 & ((dirx != 0) | (diry != 0))).astype(jnp.int32)).sum()
    occupancy = occupancy_planes.sum(axis=0).max()
    return new, RebinMonitors(
        occupancy.astype(jnp.int32),
        (lost + far0.astype(jnp.int32).sum()).astype(jnp.int32),
        deferred.astype(jnp.int32),
    )


# ------------------------------------------------- axis-factorized variant
# Count-plane indices emitted by the fused axes kernel (monitor inputs).
_FAR_PRE, _ALIVE_PRE, _ALIVE_POST, _RESID_POST = 0, 1, 2, 3


def _views_range(f, fill, lo: int, hi: int, ghost_top=None, ghost_bot=None):
    """Row views of ``f`` at offsets lo..hi (like :func:`_views`, but an
    asymmetric range — the x pass needs xl/pid at -1..+2)."""
    cap_or_k, R, C = f.shape
    if ghost_top is None:
        ghost_top = jnp.full((cap_or_k, -lo, C), fill, f.dtype)
    if ghost_bot is None:
        ghost_bot = jnp.full((cap_or_k, hi, C), fill, f.dtype)
    ext = jnp.concatenate([ghost_top, f, ghost_bot], axis=1)
    return [ext[:, o : o + R] for o in range(hi - lo + 1)]


def _dir1(coord, alive, gi, n_phys: int, inv):
    """Per-slot 1-D movement direction: one-hop clamp + physical-grid clamp
    (matches grid_ops.slab_dirs per axis: clamp, then zero dead slots)."""
    d = jnp.clip(jnp.floor(coord * inv).astype(jnp.int32), -1, 1)
    d = jnp.clip(d, -jnp.minimum(gi, 1), jnp.minimum(n_phys - 1 - gi, 1))
    return jnp.where(alive, d, 0)


def _axes_kernel(xm, x0, xp, xp2, pm, p0, pp, pp2,
                 ym, y0, yp, vxm, vx0, vxp, vym, vy0, vyp,
                 grow_ref, *rest,
                 cap, evac_cap, geom: SlabGeometry, br, has_gcol=False):
    """Fused axis-factorized rebin: rows (x) pass via +-1 row views (counts
    from up to +2), then the cols (y) pass lane-local on the x-settled
    planes — ONE HBM round trip for the whole rebin, two directions per
    pass instead of eight. Decision-for-decision twin of
    grid_ops.grid_rebin_axes (the XLA form); see grid_ops.grid_rebin's
    docstring for the loss-free acceptance contract itself.

    Also emits a (4, br, C) count stack [far_pre, alive_pre, alive_post,
    residual_movers_post] so the monitors (incl. the PRE-rebin far-mover
    flag, grid3d ADVICE-class fix) cost tiny-plane XLA reductions instead
    of a full re-read of the slab state.

    ``has_gcol``: the 2-D tile engine passes a global-col plane (its
    col-extended shards' lane 0 is a ghost lane, not global col 0); the
    y-direction wall clamps then read it, while the ``_lane_shift`` bounds
    masks stay on the LOCAL lane index (array bounds, not physical walls —
    the ghost blocks' BIG fill covers the boundary semantics).
    """
    gcol_ref = rest[0] if has_gcol else None
    xo, yo, vxo, vyo, po, cnt_out = rest[1 if has_gcol else 0:]
    C = geom.cols_pad
    inv = jnp.float32(1.0 / geom.bin_size)
    bs = jnp.float32(geom.bin_size)
    cap_f = jnp.float32(cap)
    shape = x0.shape[1:]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    gcol0 = gcol_ref[...] if has_gcol else col_iota
    grow0 = grow_ref[...]

    # ---- per-view aliveness and row-direction (x) ----------------------
    xviews = {-1: (xm, pm, grow0 - 1), 0: (x0, p0, grow0),
              1: (xp, pp, grow0 + 1), 2: (xp2, pp2, grow0 + 2)}
    alive_v = {}
    dirx_v = {}
    for v, (xv, pv, gv) in xviews.items():
        alive_v[v] = [pv[s] >= 0 for s in range(cap)]
        dirx_v[v] = [
            _dir1(xv[s], alive_v[v][s], gv, geom.rows, inv) for s in range(cap)
        ]

    def counts_of(v):
        a = jnp.zeros(shape, jnp.float32)
        m = jnp.zeros(shape, jnp.float32)
        for s in range(cap):
            a = a + jnp.where(alive_v[v][s], 1.0, 0.0)
            m = m + jnp.where(alive_v[v][s] & (dirx_v[v][s] == -1), 1.0, 0.0)
        return a, m

    alive0_cnt, _ = counts_of(0)
    alivem_cnt, _ = counts_of(-1)
    alivep_cnt, cnt_m_p1 = counts_of(1)
    _, cnt_m_p2 = counts_of(2)

    # pre-rebin monitor planes: far movers (raw 2-bin drift, either axis)
    far_pre = jnp.zeros(shape, jnp.float32)
    for s in range(cap):
        rawx = jnp.floor(x0[s] * inv).astype(jnp.int32)
        rawy = jnp.floor(y0[s] * inv).astype(jnp.int32)
        far = alive_v[0][s] & ((jnp.abs(rawx) > 1) | (jnp.abs(rawy) > 1))
        far_pre = far_pre + jnp.where(far, 1.0, 0.0)
    cnt_out[_FAR_PRE] = far_pre
    cnt_out[_ALIVE_PRE] = alive0_cnt

    # ---- x pass ---------------------------------------------------------
    F0 = cap_f - alive0_cnt
    F_at = {-1: cap_f - alivem_cnt, 1: cap_f - alivep_cnt}
    off_at_dest_of = {-1: jnp.zeros(shape, jnp.float32), 1: cnt_m_p2}
    off_of = {-1: jnp.zeros(shape, jnp.float32), 1: cnt_m_p1}
    fviews = {-1: (xm, ym, vxm, vym, pm), 1: (xp, yp, vxp, vyp, pp)}

    out_x = [x0[s] for s in range(cap)]
    out_y = [y0[s] for s in range(cap)]
    out_vx = [vx0[s] for s in range(cap)]
    out_vy = [vy0[s] for s in range(cap)]
    out_p = [p0[s] for s in range(cap)]

    empty = [p0[s] < 0 for s in range(cap)]
    empty_rank = []
    running = jnp.zeros(shape, jnp.float32)
    for s in range(cap):
        empty_rank.append(running)
        running = running + jnp.where(empty[s], 1.0, 0.0)

    for d in (-1, 1):
        # source side: clear my accepted leavers
        rank = jnp.zeros(shape, jnp.float32)
        for s in range(cap):
            mj = alive_v[0][s] & (dirx_v[0][s] == d)
            accj = mj & (rank < float(evac_cap)) & (
                off_at_dest_of[d] + rank < F_at[d]
            )
            out_x[s] = jnp.where(accj, BIG, out_x[s])
            out_y[s] = jnp.where(accj, BIG, out_y[s])
            out_vx[s] = jnp.where(accj, 0.0, out_vx[s])
            out_vy[s] = jnp.where(accj, 0.0, out_vy[s])
            out_p[s] = jnp.where(accj, -1, out_p[s])
            rank = rank + jnp.where(mj, 1.0, 0.0)

        # destination side: pull group d from the source view at -d (row
        # views are pre-aligned — no shifts at all in the x pass)
        sxl, syl, svx, svy, spid = fviews[-d]
        srank = jnp.zeros(shape, jnp.float32)
        for s in range(cap):
            mjs = alive_v[-d][s] & (dirx_v[-d][s] == d)
            accj = mjs & (srank < float(evac_cap)) & (off_of[d] + srank < F0)
            idx = off_of[d] + srank
            xre = sxl[s] - jnp.float32(d) * bs
            for t in range(cap):
                sel = accj & empty[t] & (empty_rank[t] == idx)
                out_x[t] = jnp.where(sel, xre, out_x[t])
                out_y[t] = jnp.where(sel, syl[s], out_y[t])
                out_vx[t] = jnp.where(sel, svx[s], out_vx[t])
                out_vy[t] = jnp.where(sel, svy[s], out_vy[t])
                out_p[t] = jnp.where(sel, spid[s], out_p[t])
            srank = srank + jnp.where(mjs, 1.0, 0.0)

    # ---- y pass (lane-local on the x-settled planes) --------------------
    def lshift(f, dc, fill):
        return _lane_shift(f, dc, fill, col_iota, C)

    alive_s = [out_p[s] >= 0 for s in range(cap)]
    diry_s = [
        _dir1(out_y[s], alive_s[s], gcol0, geom.cols, inv)
        for s in range(cap)
    ]
    alive_cnt = jnp.zeros(shape, jnp.float32)
    cnt_m = jnp.zeros(shape, jnp.float32)
    for s in range(cap):
        alive_cnt = alive_cnt + jnp.where(alive_s[s], 1.0, 0.0)
        cnt_m = cnt_m + jnp.where(alive_s[s] & (diry_s[s] == -1), 1.0, 0.0)
    Fy = cap_f - alive_cnt
    offy_of = {-1: jnp.zeros(shape, jnp.float32), 1: lshift(cnt_m, 1, 0.0)}

    empty2 = [out_p[s] < 0 for s in range(cap)]
    empty_rank2 = []
    running = jnp.zeros(shape, jnp.float32)
    for s in range(cap):
        empty_rank2.append(running)
        running = running + jnp.where(empty2[s], 1.0, 0.0)

    # snapshot the x-settled planes: sources must be read pre-y-pass
    mid_x = list(out_x)
    mid_y = list(out_y)
    mid_vx = list(out_vx)
    mid_vy = list(out_vy)
    mid_p = list(out_p)

    for d in (-1, 1):
        off_at_dest = lshift(offy_of[d], d, 0.0)
        F_at_dest = lshift(Fy, d, 0.0)
        rank = jnp.zeros(shape, jnp.float32)
        for s in range(cap):
            mj = alive_s[s] & (diry_s[s] == d)
            accj = mj & (rank < float(evac_cap)) & (off_at_dest + rank < F_at_dest)
            out_x[s] = jnp.where(accj, BIG, out_x[s])
            out_y[s] = jnp.where(accj, BIG, out_y[s])
            out_vx[s] = jnp.where(accj, 0.0, out_vx[s])
            out_vy[s] = jnp.where(accj, 0.0, out_vy[s])
            out_p[s] = jnp.where(accj, -1, out_p[s])
            rank = rank + jnp.where(mj, 1.0, 0.0)

        srank = jnp.zeros(shape, jnp.float32)
        for s in range(cap):
            spid_s = lshift(mid_p[s], -d, -1)
            salive = spid_s >= 0
            syl_s = lshift(mid_y[s], -d, BIG)
            sgcol = gcol0 - d
            sdy = _dir1(syl_s, salive, sgcol, geom.cols, inv)
            mjs = salive & (sdy == d)
            accj = mjs & (srank < float(evac_cap)) & (offy_of[d] + srank < Fy)
            idx = offy_of[d] + srank
            sxl_s = lshift(mid_x[s], -d, BIG)
            svx_s = lshift(mid_vx[s], -d, 0.0)
            svy_s = lshift(mid_vy[s], -d, 0.0)
            yre = syl_s - jnp.float32(d) * bs
            for t in range(cap):
                sel = accj & empty2[t] & (empty_rank2[t] == idx)
                out_x[t] = jnp.where(sel, sxl_s, out_x[t])
                out_y[t] = jnp.where(sel, yre, out_y[t])
                out_vx[t] = jnp.where(sel, svx_s, out_vx[t])
                out_vy[t] = jnp.where(sel, svy_s, out_vy[t])
                out_p[t] = jnp.where(sel, spid_s, out_p[t])
            srank = srank + jnp.where(mjs, 1.0, 0.0)

    # ---- post-pass monitor planes + field writeback ---------------------
    alive_post = jnp.zeros(shape, jnp.float32)
    resid = jnp.zeros(shape, jnp.float32)
    for s in range(cap):
        af = out_p[s] >= 0
        dxf = _dir1(out_x[s], af, grow0, geom.rows, inv)
        dyf = _dir1(out_y[s], af, gcol0, geom.cols, inv)
        alive_post = alive_post + jnp.where(af, 1.0, 0.0)
        resid = resid + jnp.where(af & ((dxf != 0) | (dyf != 0)), 1.0, 0.0)
    cnt_out[_ALIVE_POST] = alive_post
    cnt_out[_RESID_POST] = resid

    for s in range(cap):
        xo[s] = out_x[s]
        yo[s] = out_y[s]
        vxo[s] = out_vx[s]
        vyo[s] = out_vy[s]
        po[s] = out_p[s]


@functools.partial(jax.jit, static_argnames=("geom", "evac_cap", "interpret"))
def grid_rebin_axes_pallas(state: SlabState, geom: SlabGeometry, evac_cap: int,
                           interpret: bool = False, row0=None,
                           field_ghosts=None):
    """Single-chip axis-factorized rebin: one fused Mosaic kernel (x pass
    from row views, y pass lane-local) + monitors from the emitted count
    planes. Bit-matches grid_ops.grid_rebin_axes decision-for-decision.

    ``field_ghosts``: optional per-field ghost rows in (xl, yl, vx, vy,
    pid) order — xl/pid as (top 1-row, bot 2-row) blocks, yl/vx/vy as
    (top 1-row, bot 1-row) blocks (the x pass reads fields at -1..+1 and
    counts at +2) — for the sharded engine's cross-strip exchange.
    """
    new, cnt = rebin_axes_call_pallas(state, geom, evac_cap,
                                      interpret=interpret, row0=row0,
                                      field_ghosts=field_ghosts)
    # int32 BEFORE the sums: per-bin counts are small exact floats, but an
    # f32 SUM loses integer exactness past 2^24 (< the 20.97M flagship n)
    cnt = cnt.astype(jnp.int32)
    occupancy = cnt[_ALIVE_POST].max()
    lost = cnt[_ALIVE_PRE].sum() - cnt[_ALIVE_POST].sum()
    dropped = lost + cnt[_FAR_PRE].sum()
    deferred = cnt[_RESID_POST].sum()
    return new, RebinMonitors(occupancy, dropped, deferred)


def rebin_axes_call_pallas(state: SlabState, geom: SlabGeometry, evac_cap: int,
                           interpret: bool = False, row0=None, col0=None,
                           field_ghosts=None):
    """The raw fused-kernel call: returns (new_state, cnt) where ``cnt`` is
    the (4, R, C) [far_pre, alive_pre, alive_post, residual_movers] stack.
    The sharded engine reduces these planes itself (per-shard 'lost' is
    only meaningful after a psum — boundary transfers move alive counts
    between shards). ``col0``: traced global col of lane 0, passed only by
    the 2-D tile engine (col-extended shards); None keeps the single-chip
    and row-strip programs unchanged."""
    cap = state.xl.shape[0]
    R, C = state.xl.shape[1], geom.cols_pad
    br = _pick_row_block(geom, nplanes=30 * cap + 30, rows=R)
    base = 0 if row0 is None else row0
    grow = base + jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
    has_gcol = col0 is not None
    extra_in = []
    if has_gcol:
        extra_in = [col0 + jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)]

    spec = pl.BlockSpec((cap, br, C), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((br, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((4, br, C), lambda i: (0, i, 0), memory_space=pltpu.VMEM)

    ins = []
    for fi, (f, fill, lo, hi) in enumerate((
        (state.xl, BIG, -1, 2), (state.pid, -1, -1, 2),
    )):
        gt, gb = (None, None) if field_ghosts is None else field_ghosts[(0, 4)[fi]]
        ins.extend(_views_range(f, fill, lo, hi, gt, gb))
    for fi, (f, fill) in enumerate((
        (state.yl, BIG), (state.vx, 0.0), (state.vy, 0.0),
    )):
        gt, gb = (None, None) if field_ghosts is None else field_ghosts[fi + 1]
        ins.extend(_views_range(f, fill, -1, 1, gt, gb))
    ins.append(grow)
    ins.extend(extra_in)

    out_shapes = [jax.ShapeDtypeStruct((cap, R, C), jnp.float32)] * 4 + [
        jax.ShapeDtypeStruct((cap, R, C), jnp.int32),
        jax.ShapeDtypeStruct((4, R, C), jnp.float32),
    ]
    xl, yl, vx, vy, pid, cnt = pl.pallas_call(
        functools.partial(_axes_kernel, cap=cap, evac_cap=evac_cap,
                          geom=geom, br=br, has_gcol=has_gcol),
        grid=(R // br,),
        in_specs=[spec] * 17 + [gspec] * (2 if has_gcol else 1),
        out_specs=[spec] * 5 + [cspec],
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*ins)

    return SlabState(xl, yl, vx, vy, pid), cnt
