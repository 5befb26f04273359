"""Slab-grid engines: the flagship single-chip performance path.

``grid``   — dense slab-grid engine with XLA ops everywhere (runs on any
             backend; the correctness twin of the Pallas engine).
``pallas`` — same engine with the Mosaic force kernel on the hot path (the
             part3/gpu.cu analog; interpret mode off-TPU).

Step structure (cf. the reference's per-step phases, part1/vecmp.cpp:88-176
and part3/gpu.cu:187-208):

1. force   — 3x3 stencil over slot-slab planes (Pallas kernel / XLA).
2. move    — Verlet + wall reflection, elementwise on the grid.
3. rebin   — every ``rebin_every`` steps, the dense 9-direction shuffle.
   Between rebins binning is *stale*; correct while accumulated drift stays
   under ``(bin_side - cutoff)/2``, which the ``max_speed`` monitor verifies
   post-run. The reference rebins every step because pointer updates are
   cheap on CPU (serial.cpp:63-70); on TPU, amortizing the shuffle is the
   idiomatic trade.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ppsim_tpu.engines.base import Engine, Monitors, register_engine
from ppsim_tpu.ops import grid_ops
from ppsim_tpu.ops.grid_ops import SlabGeometry, SlabState
from ppsim_tpu.state import ParticleState

__all__ = ["GridEngine", "PallasGridEngine", "GridCarry"]


class GridCarry(NamedTuple):
    slab: SlabState
    step: jax.Array  # int32 step counter (drives the rebin cadence)
    monitors: Monitors


@register_engine
class GridEngine(Engine):
    name = "grid"

    def __init__(self, config):
        super().__init__(config)
        self.geom = SlabGeometry.for_config(config)

    @property
    def capacity(self) -> int:
        return self.config.grid_capacity

    def accel_of(self, xl, yl):
        cfg = self.config
        return grid_ops.grid_force_xla(
            xl, yl, self.geom, cfg.cutoff, cfg.min_r, cfg.mass
        )

    def rebin_of(self, slab):
        return grid_ops.grid_rebin(slab, self.geom, self.config.evac_capacity)

    # ------------------------------------------------------------- protocol
    def init_carry(self, state: ParticleState) -> GridCarry:
        slab, overflow = jax.jit(
            lambda p, v: grid_ops.slab_from_particles(p, v, self.geom)
        )(state.pos, state.vel)
        if int(overflow):
            raise RuntimeError(
                f"initial bin occupancy exceeds grid_capacity "
                f"{self.config.grid_capacity} by {int(overflow)}; raise grid_capacity"
            )
        return GridCarry(slab, jnp.zeros((), jnp.int32), Monitors.zeros())

    def step_carry(self, carry: GridCarry) -> GridCarry:
        cfg = self.config
        geom = self.geom

        accel = self.accel_of(carry.slab.xl, carry.slab.yl)
        slab, max_speed = grid_ops.grid_move(carry.slab, accel, geom, cfg.dt, cfg.size)

        def do_rebin(s):
            return self.rebin_of(s)

        def no_rebin(s):
            return s, grid_ops.RebinMonitors(
                jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)
            )

        step = carry.step + 1
        slab, rmon = jax.lax.cond(
            step % cfg.rebin_every == 0, do_rebin, no_rebin, slab
        )

        monitors = carry.monitors.merge(
            Monitors(rmon.max_occupancy, rmon.dropped, max_speed)
        )
        return GridCarry(slab, step, monitors)

    def frame_of(self, carry: GridCarry):
        pos, _ = grid_ops.slab_to_particles(
            carry.slab, self.geom, self.config.num_parts
        )
        return pos

    def final_state(self, carry: GridCarry) -> ParticleState:
        pos, vel = grid_ops.slab_to_particles(
            carry.slab, self.geom, self.config.num_parts
        )
        return ParticleState(pos, vel)

    def monitors_of(self, carry: GridCarry) -> Monitors:
        return carry.monitors


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@register_engine
class PallasGridEngine(GridEngine):
    name = "pallas"

    def __init__(self, config, interpret: bool | None = None):
        super().__init__(config)
        self.interpret = (not _on_tpu()) if interpret is None else interpret

    def accel_of(self, xl, yl):
        from ppsim_tpu.ops.pallas_grid import grid_force_pallas

        cfg = self.config
        return grid_force_pallas(
            xl, yl, self.geom, cfg.cutoff, cfg.min_r, cfg.mass,
            interpret=self.interpret,
        )

    def rebin_of(self, slab):
        from ppsim_tpu.ops.pallas_rebin import grid_rebin_pallas

        return grid_rebin_pallas(
            slab, self.geom, self.config.evac_capacity, interpret=self.interpret
        )
