"""Mosaic (Pallas TPU) symmetric step kernel for the 3D slab grid.

The 3D twin of ops/pallas_grid.py's symmetric kernel, on the
``(capacity, Y, X, Z)`` layout (ops/grid3d_ops.py): the kernel walks y-slabs
(grid dim), one (X, Z) register tile per slot per slab — x rolls are sublane
rolls, z rolls are lane rolls, y+-1 crosses slabs.

Newton's-third-law ownership, y-major:

- same-bin pairs: triangular loop j > s, +-f in place;
- in-plane neighbors (dy=0): the 4 lexicographically-positive (dx, dz)
  directions, evaluated at the owner and scattered to the partner with the
  inverse roll — the full (X, Z) plane is resident, so no spill is needed;
- the y+1 slab: all 9 (dx, dz) offsets read from the next slab's block
  view, accumulated force on self directly and on the partner into a
  whole-plane spill that the NEXT grid step (slab y+1) folds into its
  accumulator init — Pallas TPU executes the grid sequentially, exactly the
  2D kernel's row-spill trick, but with a full slab instead of one row.

Pair planes per bin: cap*(cap-1)/2 + 13*cap^2 (vs 27*cap^2 two-sided).
Sharded use: ghost y-slabs from both strip neighbors enter as the bottom
concat slab (read by the last block's y+1 direction) and a dedicated
top-ghost input evaluated self-side-only in block 0 (`has_ghosts`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ppsim_tpu.ops.binning import BIG
from ppsim_tpu.ops.grid3d_ops import Geometry3S
from ppsim_tpu.ops.pallas_grid import _pair_coef

__all__ = ["grid3_step_pallas"]


def _step3_kernel(yoff_ref, x_ref, xf_ref, y_ref, yf_ref, z_ref, zf_ref,
                  gx_ref, gy_ref, gz_ref,
                  vx_ref, vy_ref, vz_ref,
                  xo_ref, yo_ref, zo_ref, vxo_ref, vyo_ref, vzo_ref, spo_ref,
                  ax_ref, ay_ref, az_ref, sx_ref, sy_ref, sz_ref,
                  *, cap, geom: Geometry3S,
                  cutoff, min_r, mass, dt, size, has_ghosts, law, law_params):
    i = pl.program_id(0)
    dtf = jnp.float32(dt)
    L = jnp.float32(size)
    bsx = jnp.float32(geom.bsx)
    bsy = jnp.float32(geom.bsy)
    bsz = jnp.float32(geom.bsz)
    shape = x_ref.shape[2:]  # (Xp, Zp)
    xi = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    zi = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    bad = {
        ("x", 1): xi == (geom.xs - 1), ("x", -1): xi == 0,
        ("z", 1): zi == (geom.zs - 1), ("z", -1): zi == 0,
    }

    def plane(ref, j):
        return ref[j, 0]

    def pair(xn, yn, zn, s):
        """(+fx, +fy, +fz) on self slot s from a neighbor plane."""
        dx = xn - plane(x_ref, s)
        dy = yn - plane(y_ref, s)
        dz = zn - plane(z_ref, s)
        r2 = dx * dx + dy * dy + dz * dz
        coef = _pair_coef(r2, cutoff, min_r, mass, law, law_params)
        return coef * dx, coef * dy, coef * dz

    def rolled(p, dx, dz, mask=True):
        """Neighbor plane at (x+dx, z+dz) with physical-edge masks."""
        out = p
        if dx:
            out = pltpu.roll(out, (-dx) % shape[0], 0)
        if dz:
            out = pltpu.roll(out, (-dz) % shape[1], 1)
        if mask:
            if dx:
                out = jnp.where(bad[("x", dx)], BIG, out)
            if dz:
                out = jnp.where(bad[("z", dz)], BIG, out)
        return out

    def scat_roll(p, dx, dz):
        """Scatter: contribution to (x+dx, z+dz) sits at (x, z)."""
        out = p
        if dx:
            out = pltpu.roll(out, dx % shape[0], 0)
        if dz:
            out = pltpu.roll(out, dz % shape[1], 1)
        return out

    # 0) init accumulators; fold in the spill scattered by slab i-1
    use_spill = i > 0
    for s in range(cap):
        ax_ref[s] = jnp.where(use_spill, sx_ref[s], 0.0)
        ay_ref[s] = jnp.where(use_spill, sy_ref[s], 0.0)
        az_ref[s] = jnp.where(use_spill, sz_ref[s], 0.0)

    # 1) same-bin triangle (j > s)
    for jj in range(1, cap):
        for s in range(jj):
            fx, fy, fz = pair(plane(x_ref, jj), plane(y_ref, jj),
                              plane(z_ref, jj), s)
            ax_ref[s] = ax_ref[s] + fx
            ay_ref[s] = ay_ref[s] + fy
            az_ref[s] = az_ref[s] + fz
            ax_ref[jj] = ax_ref[jj] - fx
            ay_ref[jj] = ay_ref[jj] - fy
            az_ref[jj] = az_ref[jj] - fz

    # 2) in-plane symmetric directions (dy=0): whole plane resident, the
    #    partner's half scatters back with the inverse roll — no spill.
    INPLANE = ((0, 1), (1, -1), (1, 0), (1, 1))  # (dx, dz), lexic. positive

    def inplane_body(j, _):
        for dx, dz in INPLANE:
            xn = rolled(plane(x_ref, j), dx, dz) + jnp.float32(dx) * bsx
            yn = rolled(plane(y_ref, j), dx, dz, mask=False)
            zn = rolled(plane(z_ref, j), dx, dz, mask=False) + jnp.float32(dz) * bsz
            tx = jnp.zeros(shape, jnp.float32)
            ty = jnp.zeros(shape, jnp.float32)
            tz = jnp.zeros(shape, jnp.float32)
            for s in range(cap):
                fx, fy, fz = pair(xn, yn, zn, s)
                ax_ref[s] = ax_ref[s] + fx
                ay_ref[s] = ay_ref[s] + fy
                az_ref[s] = az_ref[s] + fz
                tx = tx - fx
                ty = ty - fy
                tz = tz - fz
            ax_ref[j] = ax_ref[j] + scat_roll(tx, dx, dz)
            ay_ref[j] = ay_ref[j] + scat_roll(ty, dx, dz)
            az_ref[j] = az_ref[j] + scat_roll(tz, dx, dz)
        return 0

    jax.lax.fori_loop(0, cap, inplane_body, 0)

    # 3) the y+1 slab: 9 (dx, dz) offsets; partner halves ride the spill
    def ynext_body(j, _):
        xj = plane(xf_ref, j)
        yj = plane(yf_ref, j) + bsy  # dy=+1 offset
        zj = plane(zf_ref, j)
        scx = jnp.zeros(shape, jnp.float32)
        scy = jnp.zeros(shape, jnp.float32)
        scz = jnp.zeros(shape, jnp.float32)
        for dx in (-1, 0, 1):
            for dz in (-1, 0, 1):
                xn = rolled(xj, dx, dz) + jnp.float32(dx) * bsx
                yn = rolled(yj, dx, dz, mask=False)
                zn = rolled(zj, dx, dz, mask=False) + jnp.float32(dz) * bsz
                tx = jnp.zeros(shape, jnp.float32)
                ty = jnp.zeros(shape, jnp.float32)
                tz = jnp.zeros(shape, jnp.float32)
                for s in range(cap):
                    fx, fy, fz = pair(xn, yn, zn, s)
                    ax_ref[s] = ax_ref[s] + fx
                    ay_ref[s] = ay_ref[s] + fy
                    az_ref[s] = az_ref[s] + fz
                    tx = tx - fx
                    ty = ty - fy
                    tz = tz - fz
                scx = scx + scat_roll(tx, dx, dz)
                scy = scy + scat_roll(ty, dx, dz)
                scz = scz + scat_roll(tz, dx, dz)
        sx_ref[j] = scx
        sy_ref[j] = scy
        sz_ref[j] = scz
        return 0

    jax.lax.fori_loop(0, cap, ynext_body, 0)

    # 3b) the TOP ghost slab (sharded halo): block 0's upper-neighbor pairs
    # cannot arrive by spill (the neighbor shard's spill dies at its edge),
    # so the first slab evaluates them self-side-only — the one place the
    # symmetric scheme still computes a pair twice, exactly the 2D kernel's
    # (and the reference MPI halo's) boundary discipline.
    if has_ghosts:
        @pl.when(i == 0)
        def _():
            def ghost_body(j, _):
                gxj = plane(gx_ref, j)
                gyj = plane(gy_ref, j) - bsy  # dy=-1 offset
                gzj = plane(gz_ref, j)
                for dx in (-1, 0, 1):
                    for dz in (-1, 0, 1):
                        xn = rolled(gxj, dx, dz) + jnp.float32(dx) * bsx
                        yn = rolled(gyj, dx, dz, mask=False)
                        zn = rolled(gzj, dx, dz, mask=False) + jnp.float32(dz) * bsz
                        for s in range(cap):
                            fx, fy, fz = pair(xn, yn, zn, s)
                            ax_ref[s] = ax_ref[s] + fx
                            ay_ref[s] = ay_ref[s] + fy
                            az_ref[s] = az_ref[s] + fz
                return 0

            jax.lax.fori_loop(0, cap, ghost_body, 0)

    # 4) Verlet move + wall reflection (reference: serial.cpp:44-61)
    x_off = xi.astype(jnp.float32) * bsx
    y_off = yoff_ref[i, 0].astype(jnp.float32) * bsy
    z_off = zi.astype(jnp.float32) * bsz

    sp = None if spo_ref is None else jnp.zeros(shape, jnp.float32)
    for s in range(cap):
        xl = plane(x_ref, s)
        alive = xl < jnp.float32(0.5 * BIG)
        vx = jnp.where(alive, plane(vx_ref, s) + ax_ref[s] * dtf, 0.0)
        vy = jnp.where(alive, plane(vy_ref, s) + ay_ref[s] * dtf, 0.0)
        vz = jnp.where(alive, plane(vz_ref, s) + az_ref[s] * dtf, 0.0)
        xl = xl + vx * dtf
        yl = plane(y_ref, s) + vy * dtf
        zl = plane(z_ref, s) + vz * dtf

        def reflect(local, off, v):
            g = local + off
            out = (g < 0.0) | (g > L)
            m = jnp.mod(g, 2.0 * L)
            local = jnp.where(out, (L - jnp.abs(m - L)) - off, local)
            v = jnp.where(out & (m > L), -v, v)
            return local, v

        xl, vx = reflect(xl, x_off, vx)
        yl, vy = reflect(yl, y_off, vy)
        zl, vz = reflect(zl, z_off, vz)

        xo_ref[s, 0] = jnp.where(alive, xl, BIG)
        yo_ref[s, 0] = jnp.where(alive, yl, BIG)
        zo_ref[s, 0] = jnp.where(alive, zl, BIG)
        vxo_ref[s, 0] = vx
        vyo_ref[s, 0] = vy
        vzo_ref[s, 0] = vz
        # max-|v|^2 monitor plane: dead slots hold v = 0, matching
        # grid3d_ops.grid3_move's alive-masked speed2 exactly
        if spo_ref is not None:
            sp = jnp.maximum(sp, vx * vx + vy * vy + vz * vz)
    if spo_ref is not None:
        spo_ref[0] = sp


def _step3_kernel_nospeed(yoff_ref, x_ref, xf_ref, y_ref, yf_ref, z_ref,
                          zf_ref, gx_ref, gy_ref, gz_ref,
                          vx_ref, vy_ref, vz_ref,
                          xo_ref, yo_ref, zo_ref, vxo_ref, vyo_ref, vzo_ref,
                          ax_ref, ay_ref, az_ref, sx_ref, sy_ref, sz_ref,
                          **kw):
    """Six-output variant: no speed plane (spo_ref=None skips its compute)."""
    _step3_kernel(yoff_ref, x_ref, xf_ref, y_ref, yf_ref, z_ref, zf_ref,
                  gx_ref, gy_ref, gz_ref, vx_ref, vy_ref, vz_ref,
                  xo_ref, yo_ref, zo_ref, vxo_ref, vyo_ref, vzo_ref, None,
                  ax_ref, ay_ref, az_ref, sx_ref, sy_ref, sz_ref, **kw)


# Largest slot capacity that emits the max-|v|^2 monitor plane IN-KERNEL.
# The plane's extra live values tip Mosaic's register allocator into heavy
# spilling at high capacities: measured at n=20.97M, the LJ body needs
# 111.2 MB of scoped VMEM at cap 12 without the plane, compiles WITH the
# plane at cap 12 (the 3D repulsive check-gate), but needs 135.8 MB at
# cap 13 with it — over the 128 MB physical VMEM. Above this cap the
# engine reduces max speed XLA-side from the returned velocity planes
# instead (~1.5% step cost: one extra HBM pass over three slabs).
SPEED_PLANE_CAP_MAX = 12


@functools.partial(
    jax.jit,
    static_argnames=("geom", "cutoff", "min_r", "mass", "dt", "size",
                     "interpret", "law", "law_params", "emit_speed"),
)
def grid3_step_pallas(xl, yl, zl, vx, vy, vz, geom: Geometry3S,
                      cutoff, min_r, mass, dt, size, interpret=False,
                      y0=None, ghosts=None, law="repulsive", law_params=(),
                      emit_speed=True):
    """Fused symmetric 3D force+move step. Returns (xl', yl', zl', vx',
    vy', vz', speed2) where ``speed2`` is a (Y, Xp, Zp) plane of per-bin
    max |v|^2 over slots (reduce with ``jnp.sqrt(speed2.max())`` — the
    stale-slack monitor input, emitted in-kernel to avoid an extra HBM
    pass over the three velocity slabs). With ``emit_speed=False`` the
    plane is neither computed nor returned (speed2 is None): the caller
    reduces over the velocity outputs instead (dead slots hold v = 0).
    Use for capacities above ``SPEED_PLANE_CAP_MAX``, where the plane's
    register pressure pushes the kernel past physical VMEM.

    ``y0``: traced global index of this array's first y-slab (sharded
    strips pass ``axis_index * ys_local``; default 0).
    ``ghosts``: optional 6-tuple (top_xl, top_yl, top_zl, bot_xl, bot_yl,
    bot_zl) of (cap, 1, X, Z) neighbor boundary slabs (sharded halo).
    """
    cap = geom.capacity
    Y = xl.shape[1]
    Xp, Zp = geom.xs_pad, geom.zs_pad

    if ghosts is None:
        pad = jnp.full((cap, 1, Xp, Zp), BIG, jnp.float32)
        tx = ty = tz = pad
        bx, by, bz = pad, pad, pad
    else:
        tx, ty, tz, bx, by, bz = ghosts
    xe = jnp.concatenate([xl, bx], axis=1)
    ye = jnp.concatenate([yl, by], axis=1)
    ze = jnp.concatenate([zl, bz], axis=1)

    base = 0 if y0 is None else y0
    yoff = (base + jnp.arange(Y, dtype=jnp.int32))[:, None]

    main = pl.BlockSpec((cap, 1, Xp, Zp), lambda i: (0, i, 0, 0),
                        memory_space=pltpu.VMEM)
    nxt = pl.BlockSpec((cap, 1, Xp, Zp), lambda i: (0, i + 1, 0, 0),
                       memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((cap, 1, Xp, Zp), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    yspec = pl.BlockSpec((Y, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    kernel = functools.partial(
        _step3_kernel if emit_speed else _step3_kernel_nospeed,
        cap=cap, geom=geom,
        cutoff=cutoff, min_r=min_r, mass=mass, dt=dt, size=size,
        has_ghosts=ghosts is not None, law=law, law_params=law_params,
    )
    out_specs = [main] * 6
    out_shape = [jax.ShapeDtypeStruct((cap, Y, Xp, Zp), jnp.float32)] * 6
    if emit_speed:
        out_specs += [pl.BlockSpec((1, Xp, Zp), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)]
        out_shape += [jax.ShapeDtypeStruct((Y, Xp, Zp), jnp.float32)]
    out = pl.pallas_call(
        kernel,
        grid=(Y,),
        in_specs=[yspec] + [main, nxt] * 3 + [gspec] * 3 + [main] * 3,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((cap, Xp, Zp), jnp.float32)] * 6,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # 127MB (like pallas_rebin3): the LJ body at n=20.97M /
            # cap 12 wants 111.2MB of scoped stack — 110MB was 1.2MB short.
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=Y * Xp * Zp * cap * cap * 14 * 20,
            bytes_accessed=Y * Xp * Zp * cap * 4 * 18,
            transcendentals=Y * Xp * Zp * cap * cap * 14,
        ),
    )(yoff, xe, xe, ye, ye, ze, ze, tx, ty, tz, vx, vy, vz)
    if not emit_speed:
        return tuple(out) + (None,)
    return tuple(out)
