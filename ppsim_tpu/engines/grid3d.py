"""3D dense slab-grid engines: the stretch config in the flagship layout.

``grid3d``   — XLA 27-plane stencil twin (any backend; correctness anchor).
``pallas3d`` — same engine with the symmetric Mosaic step kernel
               (ops/pallas_grid3d.py) on the force+move path.

The 2D slab architecture carries over wholesale (see ops/grid3d_ops.py for
the layout): fields are (capacity, Y, X, Z) with y the blocked/shard axis
(x sublanes, z lanes), and the statically-scheduled run driver, monitors,
and save path are inherited from the 2D GridEngine unchanged (the rebin
cadence is ``rebin3_every``, or auto-derived from the chosen geometry's
tightest-axis slack — see Geometry3S.cadence). Both force laws
plug in through the same seam; the full stretch config
(BASELINE.json configs[4]) is ``SimConfig(ndim=3, force_law="lj")`` with
``--engine grid3d`` or ``pallas3d``.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ppsim_tpu.engines.base import Monitors, RunResult, register_engine
from ppsim_tpu.engines.grid import GridCarry, GridEngine
from ppsim_tpu.ops import grid3d_ops
from ppsim_tpu.ops.grid3d_ops import Geometry3S, Slab3State
from ppsim_tpu.state import ParticleState

__all__ = ["Grid3DEngine", "Pallas3DEngine"]


def _coef_of(config):
    from ppsim_tpu.physics import coef_from_r2, lj_coef_from_r2

    if config.force_law == "lj":
        return functools.partial(
            lj_coef_from_r2, cutoff=config.cutoff, min_r=config.min_r,
            mass=config.mass, epsilon=config.lj_epsilon, sigma=config.lj_sigma,
        )
    return functools.partial(
        coef_from_r2, cutoff=config.cutoff, min_r=config.min_r,
        mass=config.mass,
    )


@register_engine
class Grid3DEngine(GridEngine):
    name = "grid3d"
    supported_ndim = (3,)

    def __init__(self, config):
        super(GridEngine, self).__init__(config)  # skip 2D geom setup
        from ppsim_tpu.engines.grid import require_f32

        require_f32(config)
        self.geom = Geometry3S.for_config(config)

    @property
    def capacity(self) -> int:
        # The geometry may add anisotropy headroom slots on top of
        # config.grid3_capacity (Geometry3S.for_config).
        return self.geom.capacity

    @property
    def rebin_every(self) -> int:
        # Geometry-aware: lane-snapped anisotropic bins have per-axis slack,
        # so the auto cadence comes from the chosen geometry's tightest axis.
        return self.geom.cadence(self.config)

    def check(self, result: RunResult) -> None:
        cfg = self.config
        mx = int(result.monitors.max_bin_count)
        if mx > self.capacity:
            raise RuntimeError(
                f"bin overflow: max occupancy {mx} > capacity {self.capacity}"
            )
        if int(result.monitors.migrate_dropped):
            raise RuntimeError(
                f"{int(result.monitors.migrate_dropped)} particles dropped"
            )
        drift = self.rebin_every * float(result.monitors.max_speed) * cfg.dt
        g = self.geom
        slack = (min(g.bsx, g.bsy, g.bsz) - cfg.cutoff) / 2.0
        if drift > slack:
            raise RuntimeError(
                f"stale-bin slack violated: {drift:.4g} > {slack:.4g}; "
                "lower rebin_every or raise grid3_bin_scale"
            )

    # ------------------------------------------------------------ phases
    def move_phase(self, slab: Slab3State):
        cfg = self.config
        accel = grid3d_ops.grid3_force_xla(
            slab.xl, slab.yl, slab.zl, self.geom, _coef_of(cfg)
        )
        return grid3d_ops.grid3_move(slab, accel, self.geom, cfg.dt, cfg.size)

    def rebin_of(self, slab):
        return grid3d_ops.grid3_rebin_axes(
            slab, self.geom, self.config.evac_capacity
        )

    # ----------------------------------------------------------- protocol
    def _pack_jit(self):
        if not hasattr(self, "_pack"):
            self._pack = jax.jit(
                lambda p, v: grid3d_ops.slab3_from_particles(p, v, self.geom)
            )
        return self._pack

    # Run-tail headroom on top of the measured initial packing, keyed on
    # the force law: the repulsive law's measured run max never exceeds its
    # initial lattice packing (20.97M: packs 12, runs at 12), while LJ's
    # attractive tail clusters pockets ONE slot past it (20.97M: packs 12,
    # runs to 13) — bench/results_tpu3d.jsonl max_bin_count columns. This
    # is what previously forced the hand flags `--grid3-capacity 11`
    # (repulsive) / `12` (LJ) at the stretch scale.
    _TAIL_SLOTS = {"repulsive": 0, "lj": 1}

    # Drop-detected escalation (run() below) is safe where re-tracing
    # against a new static geometry only needs the per-instance jit caches
    # cleared. The sharded 3D engine opts out: its shard extents were
    # computed against the init-time geometry.
    _capacity_retry = True
    _DROP_RETRIES = 2

    def _set_capacity(self, new_cap: int) -> None:
        """Rebuild the geometry at ``new_cap`` slots and clear every
        per-instance jit cache — they are traced against the old static
        geometry. Candidate-choice costs are not re-scored: capacity is a
        pure headroom axis here (the snap chooser already priced the bin
        SHAPE)."""
        self.geom = dataclasses.replace(self.geom, capacity=new_cap)
        for cache in ("_pack", "_final_jit", "_frame_jit"):
            self.__dict__.pop(cache, None)
        self._programs.clear()

    def init_carry(self, state: ParticleState) -> GridCarry:
        slab, overflow = self._pack_jit()(state.pos, state.vel)
        if int(overflow):
            # Auto-raise: the initial lattice packing is measured exactly
            # (packing = capacity + overflow), so rebuild the geometry at
            # packing + the law-keyed run-tail margin and re-pack once.
            import sys

            packing = self.capacity + int(overflow)
            new_cap = packing + self._TAIL_SLOTS.get(
                self.config.force_law, 1)
            print(
                f"grid3d: initial packing {packing} exceeds capacity "
                f"{self.capacity}; auto-raising capacity to {new_cap} "
                f"(+{new_cap - packing} {self.config.force_law} run-tail "
                "headroom)", file=sys.stderr)
            self._set_capacity(new_cap)
            slab, overflow = self._pack_jit()(state.pos, state.vel)
            assert int(overflow) == 0  # packing was measured exactly
        return GridCarry(slab, jnp.zeros((), jnp.int32), Monitors.zeros())

    def maybe_escalate_after_drop(self, result) -> bool:
        """Drop-detected capacity escalation hook (Engine default: False).

        The auto-capacity chooser's LJ floor is calibrated to the measured
        benchmark range (ops/grid3d_ops.py, _LJ_FLOOR_* notes); beyond it
        — unmeasured densities, longer runs, bigger grids — attractive-law
        clustering can still outgrow any static choice, and under-capacity
        shows up as DROPPED particles (the monitors catch what the
        reference's gpu.cu:109-111 silently corrupts). Auto-capacity runs
        self-heal instead of failing at the final check: on a drop, raise
        capacity one slot and tell the caller to re-run from the initial
        state (full restart — a dropped particle is unrecoverable
        mid-run). Hand-set capacities (config.grid3_capacity != None)
        never retry: ablations and overflow tests under-provision on
        purpose. Callers: Engine.run-style drivers and the CLI timing path
        (harness.timed_run), each with its own bounded retry count.
        """
        if (self.config.grid3_capacity is not None
                or not self._capacity_retry
                or int(result.monitors.migrate_dropped) == 0):
            return False
        import sys

        new_cap = self.geom.capacity + 1
        print(
            f"grid3d: run dropped "
            f"{int(result.monitors.migrate_dropped)} particle(s) at "
            f"capacity {self.geom.capacity}; escalating to {new_cap} "
            "and re-running from the initial state", file=sys.stderr)
        self._set_capacity(new_cap)
        return True

    def run(self, state: ParticleState, nsteps=None, savefreq: int = 0,
            **kw):
        """Engine.run plus the drop-detected capacity escalation retry
        (see :meth:`maybe_escalate_after_drop`)."""
        result = super().run(state, nsteps, savefreq, **kw)
        for _try in range(self._DROP_RETRIES):
            if not self.maybe_escalate_after_drop(result):
                break
            result = super().run(state, nsteps, savefreq, **kw)
        return result

    def frame_of(self, carry: GridCarry):
        pos, _ = grid3d_ops.slab3_to_particles(
            carry.slab, self.geom, self.config.num_parts
        )
        return pos

    def final_state(self, carry: GridCarry) -> ParticleState:
        pos, vel = grid3d_ops.slab3_to_particles(
            carry.slab, self.geom, self.config.num_parts
        )
        return ParticleState(pos, vel)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@register_engine
class Pallas3DEngine(Grid3DEngine):
    name = "pallas3d"
    supported_ndim = (3,)

    def __init__(self, config, interpret: bool | None = None):
        super().__init__(config)
        self.interpret = (not _on_tpu()) if interpret is None else interpret

    def move_phase(self, slab: Slab3State):
        from ppsim_tpu.ops.pallas_grid3d import (
            SPEED_PLANE_CAP_MAX,
            grid3_step_pallas,
        )

        cfg = self.config
        xl, yl, zl, vx, vy, vz, speed2 = grid3_step_pallas(
            slab.xl, slab.yl, slab.zl, slab.vx, slab.vy, slab.vz, self.geom,
            cfg.cutoff, cfg.min_r, cfg.mass, cfg.dt, cfg.size,
            interpret=self.interpret,
            law=cfg.force_law, law_params=cfg.law_params,
            emit_speed=self.geom.capacity <= SPEED_PLANE_CAP_MAX,
        )
        if speed2 is None:
            # High-cap fallback: reduce over the returned velocity planes
            # (dead slots hold v = 0 — same masking as the in-kernel plane).
            speed2 = vx * vx + vy * vy + vz * vz
        max_speed = jnp.sqrt(speed2.max())
        return Slab3State(xl, yl, zl, vx, vy, vz, slab.pid), max_speed

    def rebin_of(self, slab):
        # Mosaic 3D rebin (fused xz pass + y pass) — the XLA axis-factorized
        # rebin was the dominant non-force step cost and the ~8M single-chip
        # ceiling (round-2 verdict #1).
        from ppsim_tpu.ops.pallas_rebin3 import grid3_rebin_pallas

        return grid3_rebin_pallas(
            slab, self.geom, self.config.evac_capacity,
            interpret=self.interpret,
        )
