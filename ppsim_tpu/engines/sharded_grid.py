"""Multi-chip slab-grid engine: the flagship path, spatially sharded.

Combines the two performance pillars: the dense slab-grid Mosaic kernels
(engines/grid.py) run per shard, and the domain is split into row strips over
a 1-D device mesh exactly like the reference's MPI decomposition
(part2/mpi.cpp:258-294) — but with the TPU-native transport:

- **force halo**: each step, the strip's boundary bin row (xl, yl slabs,
  fixed shape) moves to both neighbors by ``lax.ppermute`` over ICI and
  enters the fused force+move kernel as ghost rows — the static-shape
  replacement for ``communicate_with_neighbor_proc``'s variable-length
  ``MPI_Sendrecv`` (part2/mpi.cpp:122-146).
- **migration**: the loss-free rebin's acceptance predicate is evaluated from
  *count planes* (see ops/pallas_rebin.py); exchanging one ghost row of every
  field and two ghost rows of the count stack makes cross-shard migration
  fall out of the same destination-pull shuffle — no emigrant buffers, no
  handshakes, no equivalent of mpi.cpp:230-253's send/recv pairs at all.
  Both shards evaluate identical predicates on identical exchanged data, so
  transfers are consistent by construction.
- **no barriers**: SPMD program order (the reference needs three
  ``MPI_Barrier`` per step, mpi.cpp:308,358,364).

Rebin cadence uses the statically-scheduled driver (GridEngine._run_impl) for
both unsaved and saved runs, so no collective ever sits under a traced
conditional on either path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ppsim_tpu.config import SimConfig
from ppsim_tpu.engines.base import register_engine
from ppsim_tpu.engines.grid import GridEngine
from ppsim_tpu.ops import grid_ops
from ppsim_tpu.ops.binning import BIG
from ppsim_tpu.ops.grid_ops import SlabGeometry, SlabState
from ppsim_tpu.state import ParticleState

__all__ = ["ShardedGridEngine"]


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@register_engine
class ShardedGridEngine(GridEngine):
    name = "sharded_grid"
    # No drop-detected capacity escalation here (GridEngine._capacity_retry):
    # the shard_map step closures below bind self.geom at __init__, so a
    # mid-lifetime capacity flip would leave them tracing the stale
    # geometry. An under-capacity run fails loudly at check() instead.
    # (The 3D strip engine re-binds per capacity and does heal —
    # sharded_grid3d.py.)
    _capacity_retry = False

    def __init__(
        self,
        config: SimConfig,
        devices: Optional[Sequence[jax.Device]] = None,
        interpret: Optional[bool] = None,
        impl: str = "pallas",
    ):
        """``impl``: "pallas" (Mosaic kernels per shard; interpret-emulated
        off-TPU) or "xla" (the grid twin ops per shard via ghost-row
        extension — algorithmically identical, and the only practical way to
        run big multi-device problems on a CPU mesh, where interpret-mode
        Mosaic is ~1000x off)."""
        super().__init__(config)
        devices = list(devices) if devices is not None else jax.devices()
        self.mesh = Mesh(np.array(devices), axis_names=("x",))
        self.P = len(devices)
        self.interpret = (not _on_tpu()) if interpret is None else interpret
        if impl not in ("pallas", "xla"):
            raise ValueError(f"unknown sharded_grid impl {impl!r}")
        self.impl = impl

        base = self.geom
        # Local strips must be row-block friendly; pad global rows to
        # P * rows_local with rows_local a multiple of 8.
        rows_local = -(-base.rows // (self.P * 8)) * 8
        self.rows_local = rows_local
        self.geom = dataclasses.replace(base, rows_pad=self.P * rows_local)

        spec_f = P(None, "x", None)
        # check_vma=False: pallas_call out_shapes carry no varying-mesh-axis
        # annotation, which the vma checker requires inside shard_map.
        self._plain_step = jax.shard_map(
            self._local_plain,
            mesh=self.mesh,
            in_specs=(spec_f,) * 5,
            out_specs=((spec_f,) * 4) + (P(),),
            check_vma=False,
        )
        self._rebin_step = jax.shard_map(
            self._local_move_rebin,
            mesh=self.mesh,
            in_specs=(spec_f,) * 5,
            out_specs=((spec_f,) * 5) + (P(),) * 4,
            check_vma=False,
        )

    # ------------------------------------------------------------- plumbing
    def _from_above(self, x, fill):
        """Receive from device d-1 (edge device 0 gets fill)."""
        perm = [(i, i + 1) for i in range(self.P - 1)]
        out = jax.lax.ppermute(x, "x", perm)
        return jnp.where(jax.lax.axis_index("x") == 0, fill, out)

    def _from_below(self, x, fill):
        """Receive from device d+1 (edge device P-1 gets fill)."""
        perm = [(i + 1, i) for i in range(self.P - 1)]
        out = jax.lax.ppermute(x, "x", perm)
        return jnp.where(jax.lax.axis_index("x") == self.P - 1, fill, out)

    def _halo(self, f, fill, halo: int):
        """(top, bot) ghost blocks of ``halo`` rows from both neighbors."""
        top = self._from_above(f[:, -halo:, :], jnp.full_like(f[:, -halo:, :], fill))
        bot = self._from_below(f[:, :halo, :], jnp.full_like(f[:, :halo, :], fill))
        return top, bot

    # ---------------------------------------------------------- local steps
    # ``_phase_disable`` ("move" | "rebin" | None) is profiling.phase_times'
    # variant-subtraction seam: the shard_map closures bind these methods at
    # __init__, so the single-chip engines' monkeypatch seam can't reach
    # them — instead the flag is consulted at TRACE time (phase_times jits
    # a fresh scan per variant).
    _phase_disable = None

    def _local_plain(self, xl, yl, vx, vy, pid):
        if self._phase_disable == "move":
            return xl, yl, vx, vy, jnp.zeros((), jnp.float32)
        if self.impl == "xla":
            return self._local_plain_xla(xl, yl, vx, vy, pid)
        from ppsim_tpu.ops.pallas_grid import grid_step_pallas

        cfg = self.config
        row0 = jax.lax.axis_index("x") * self.rows_local
        tx, bx = self._halo(xl, BIG, 1)
        ty, by = self._halo(yl, BIG, 1)
        nxl, nyl, nvx, nvy, speed2 = grid_step_pallas(
            xl, yl, vx, vy, self.geom,
            cfg.cutoff, cfg.min_r, cfg.mass, cfg.dt, cfg.size,
            interpret=self.interpret, row0=row0, ghosts=(tx, ty, bx, by),
            law=cfg.force_law, law_params=cfg.law_params,
        )
        max_speed = jax.lax.pmax(jnp.sqrt(speed2.max()), "x")
        return nxl, nyl, nvx, nvy, max_speed

    def _local_plain_xla(self, xl, yl, vx, vy, pid):
        """XLA-twin per-shard step: the halo enters as a literal 1-ghost-row
        extension of the slab arrays, then the single-chip twin ops run on
        the extended slab and the interior is sliced back out."""
        from ppsim_tpu.physics import accel_fn_for

        cfg = self.config
        row0 = jax.lax.axis_index("x") * self.rows_local
        tx, bx = self._halo(xl, BIG, 1)
        ty, by = self._halo(yl, BIG, 1)
        xe = jnp.concatenate([tx, xl, bx], axis=1)
        ye = jnp.concatenate([ty, yl, by], axis=1)
        ax, ay = grid_ops.grid_force_xla(
            xe, ye, self.geom, cfg.cutoff, cfg.min_r, cfg.mass,
            pair_fn=accel_fn_for(cfg),
        )
        slab = SlabState(xl, yl, vx, vy, pid)
        new, max_speed = grid_ops.grid_move(
            slab, (ax[:, 1:-1], ay[:, 1:-1]), self.geom, cfg.dt, cfg.size,
            row0=row0,
        )
        max_speed = jax.lax.pmax(max_speed, "x")
        return new.xl, new.yl, new.vx, new.vy, max_speed

    def _local_rebin_xla(self, state: SlabState, row0):
        """XLA-twin cross-shard rebin: extend by TWO ghost rows of every
        field (the acceptance predicate at a destination needs its full 3x3
        count neighborhood — the same reason the Mosaic path exchanges two
        ghost rows of the count planes), run the single-chip loss-free
        shuffle on the extension, slice the interior. Both neighbors compute
        identical acceptance decisions from identical overlapping data, so
        cross-shard transfers stay consistent with no handshake."""
        cfg = self.config
        g = [
            self._halo(f, fill, 2)
            for f, fill in ((state.xl, BIG), (state.yl, BIG),
                            (state.vx, 0.0), (state.vy, 0.0),
                            (state.pid, -1))
        ]
        ext = SlabState(
            *(jnp.concatenate([t, f, b], axis=1)
              for (t, b), f in zip(g, state))
        )
        rebin = (grid_ops.grid_rebin_axes
                 if cfg.grid_rebin_mode == "axes" else grid_ops.grid_rebin)
        new_ext, _ = rebin(ext, self.geom, cfg.evac_capacity, row0=row0 - 2)
        return SlabState(*(f[:, 2:-2, :] for f in new_ext))

    def _local_move_rebin(self, xl, yl, vx, vy, pid):
        from ppsim_tpu.ops.pallas_rebin import (
            rebin_counts_pallas,
            rebin_shuffle_pallas,
        )

        cfg = self.config
        nxl, nyl, nvx, nvy, max_speed = self._local_plain(xl, yl, vx, vy, pid)
        state = SlabState(nxl, nyl, nvx, nvy, pid)
        row0 = jax.lax.axis_index("x") * self.rows_local

        if self._phase_disable == "rebin":
            z = jnp.zeros((), jnp.int32)
            return (state.xl, state.yl, state.vx, state.vy, state.pid,
                    z, z, z, max_speed)

        if self.impl != "xla" and cfg.grid_rebin_mode == "axes":
            # Fused axes kernel per shard: the x (strip-axis) pass reads
            # fields at -1..+1 rows and counts at +2, so the exchange is
            # 1 ghost row from above and 1 (2 for xl/pid) from below —
            # strictly less traffic than the dirs9 path's field + 9-plane
            # count ghosts. Monitors come from the kernel's count planes,
            # reduced across shards (per-shard 'lost' is transfer flux).
            from ppsim_tpu.ops.pallas_rebin import (
                _ALIVE_POST,
                _ALIVE_PRE,
                _FAR_PRE,
                _RESID_POST,
                rebin_axes_call_pallas,
            )

            fills = ((state.xl, BIG), (state.yl, BIG), (state.vx, 0.0),
                     (state.vy, 0.0), (state.pid, -1))
            ghosts = []
            for fi, (f, fill) in enumerate(fills):
                nbot = 2 if fi in (0, 4) else 1
                top = self._from_above(
                    f[:, -1:, :], jnp.full_like(f[:, -1:, :], fill)
                )
                bot = self._from_below(
                    f[:, :nbot, :], jnp.full_like(f[:, :nbot, :], fill)
                )
                ghosts.append((top, bot))
            new, cnt = rebin_axes_call_pallas(
                state, self.geom, cfg.evac_capacity,
                interpret=self.interpret, row0=row0, field_ghosts=ghosts,
            )
            # int32 BEFORE the sums: f32 sums lose integer exactness past
            # 2^24, below the flagship particle counts
            cnt = cnt.astype(jnp.int32)
            before = jax.lax.psum(cnt[_ALIVE_PRE].sum(), "x")
            after = jax.lax.psum(cnt[_ALIVE_POST].sum(), "x")
            far_n = jax.lax.psum(cnt[_FAR_PRE].sum(), "x")
            deferred = jax.lax.psum(cnt[_RESID_POST].sum(), "x")
            occupancy = jax.lax.pmax(cnt[_ALIVE_POST].max(), "x")
            dropped = (before - after) + far_n
            return (new.xl, new.yl, new.vx, new.vy, new.pid,
                    occupancy, dropped, deferred, max_speed)

        if self.impl == "xla":
            new = self._local_rebin_xla(state, row0)
        else:
            counts = rebin_counts_pallas(
                state, self.geom, interpret=self.interpret, row0=row0
            )
            field_ghosts = [
                self._halo(f, fill, 1)
                for f, fill in ((state.xl, BIG), (state.yl, BIG),
                                (state.vx, 0.0), (state.vy, 0.0),
                                (state.pid, -1))
            ]
            count_ghosts = self._halo(counts, 0.0, 2)
            new = rebin_shuffle_pallas(
                state, counts, self.geom, cfg.evac_capacity,
                interpret=self.interpret, row0=row0,
                field_ghosts=field_ghosts, count_ghosts=count_ghosts,
            )

        # monitors (cross-shard aware: transfers move alive counts between
        # shards, so loss is only meaningful after the psum)
        before = jax.lax.psum((state.pid >= 0).astype(jnp.int32).sum(), "x")
        occ_planes = (new.pid >= 0).astype(jnp.int32)
        after = jax.lax.psum(occ_planes.sum(), "x")
        # far from the PRE-rebin state: the shuffle moves a 2-bin drifter one
        # hop, after which it reads as a benign deferred 1-bin mover — the
        # slack-violation signal (fatal, matches grid_rebin) lives pre-rebin.
        _, _, far0, _ = grid_ops.slab_dirs(state, self.geom, row0=row0)
        dirx, diry, _, alive2 = grid_ops.slab_dirs(new, self.geom, row0=row0)
        deferred = jax.lax.psum(
            (alive2 & ((dirx != 0) | (diry != 0))).astype(jnp.int32).sum(), "x"
        )
        far_n = jax.lax.psum(far0.astype(jnp.int32).sum(), "x")
        occupancy = jax.lax.pmax(occ_planes.sum(axis=0).max(), "x")
        dropped = (before - after) + far_n
        return (new.xl, new.yl, new.vx, new.vy, new.pid,
                occupancy.astype(jnp.int32), dropped.astype(jnp.int32),
                deferred.astype(jnp.int32), max_speed)

    # -------------------------------------------------------- engine hooks
    def move_phase(self, slab: SlabState):
        xl, yl, vx, vy, max_speed = self._plain_step(
            slab.xl, slab.yl, slab.vx, slab.vy, slab.pid
        )
        return SlabState(xl, yl, vx, vy, slab.pid), max_speed

    def step_with_rebin(self, carry):
        from ppsim_tpu.engines.base import Monitors
        from ppsim_tpu.engines.grid import GridCarry

        s = carry.slab
        xl, yl, vx, vy, pid, occ, dropped, deferred, max_speed = self._rebin_step(
            s.xl, s.yl, s.vx, s.vy, s.pid
        )
        monitors = carry.monitors.merge(
            Monitors(occ, dropped, max_speed, deferred)
        )
        return GridCarry(SlabState(xl, yl, vx, vy, pid), carry.step + 1, monitors)

    def rebin_of(self, slab):  # pragma: no cover - superclass cond path
        raise NotImplementedError(
            "sharded_grid runs rebins only on the statically-blocked path; "
            "use savefreq aligned with rebin_every"
        )

    def step_carry(self, carry):
        # Traced-cond cadence would put collectives under a conditional;
        # emulate it with the two static step variants selected by the
        # (replicated) step counter via lax.cond on *whole shard_map calls*.
        return jax.lax.cond(
            (carry.step + 1) % self.config.rebin_every == 0,
            self.step_with_rebin,
            self.step_plain,
            carry,
        )

    def init_carry(self, state: ParticleState):
        from ppsim_tpu.engines.grid import GridCarry, seed_pack_monitors

        slab, overflow = self._pack_jit()(state.pos, state.vel)
        # Pack overflow is deferred into the monitors (check() raises
        # post-run) — an eager int(overflow) here is a device->host sync
        # inside the timed region; see GridEngine.init_carry.
        sh = NamedSharding(self.mesh, P(None, "x", None))
        slab = SlabState(*(jax.device_put(f, sh) for f in slab))
        return GridCarry(slab, jnp.zeros((), jnp.int32),
                         seed_pack_monitors(overflow, self.capacity))
