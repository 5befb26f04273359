"""O(N^2) all-pairs oracle engine — the in-repo ground truth.

Functional rebuild of the reference's brute-force engine
(part1/reference.cpp:52-65): every particle accumulates the repulsive force
from every other particle (self-pairs contribute exactly zero by the radial
force law), then integrates. Quadratic, but the trust anchor every binned /
sharded engine is tested against — the reference kept reference.cpp for the
same purpose.

For moderate N the pair matrix is materialized in (N, N) tiles via a scanned
row-block loop so memory stays bounded at ``block x N``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ppsim_tpu.engines.base import Carry, Engine, register_engine
from ppsim_tpu.physics import accel_fn_for, accel_vec_fn_for, verlet_step

__all__ = ["OracleEngine", "all_pairs_accel", "all_pairs_accel_vec"]


def all_pairs_accel(pos, pair_fn, block: int = 2048):
    """(N, 2) accelerations from the dense all-pairs interaction.

    ``pair_fn(dx, dy) -> (ax, ay)`` is the force law (physics.accel_fn_for).
    Row-blocked so the live pair tensor is (block, N) rather than (N, N).
    """
    n = pos.shape[0]
    nblocks = -(-n // block)
    padded = nblocks * block
    pos_pad = jnp.pad(pos, ((0, padded - n), (0, 0)))
    rows = pos_pad.reshape(nblocks, block, 2)

    def one_block(prow):
        dx = pos[None, :, 0] - prow[:, 0:1]
        dy = pos[None, :, 1] - prow[:, 1:2]
        ax, ay = pair_fn(dx, dy)
        return jnp.stack([ax.sum(-1), ay.sum(-1)], axis=-1)

    accel = jax.lax.map(one_block, rows)
    return accel.reshape(padded, 2)[:n]


def all_pairs_accel_vec(pos, accel_vec, block: int = 2048):
    """Dimension-agnostic all-pairs accelerations: ``accel_vec`` is the
    (..., D)-displacement force law from physics.accel_vec_fn_for. Used by
    the 3D oracle; the 2D path keeps the historical (dx, dy) formulation so
    its bit-exact pairing with the binned engine is undisturbed."""
    n, dim = pos.shape
    nblocks = -(-n // block)
    padded = nblocks * block
    pos_pad = jnp.pad(pos, ((0, padded - n), (0, 0)))
    rows = pos_pad.reshape(nblocks, block, dim)

    def one_block(prow):
        d = pos[None, :, :] - prow[:, None, :]
        return accel_vec(d).sum(axis=1)

    accel = jax.lax.map(one_block, rows)
    return accel.reshape(padded, dim)[:n]


@register_engine
class OracleEngine(Engine):
    name = "oracle"
    supported_ndim = (2, 3)

    # profiling.phase_times' trace-time variant seam: "force" zeroes the
    # accelerations (the integrator still runs on zeros, so its cost stays
    # in the variant); "force+move" also skips the integrator (the vecmp
    # t1..t4 analog for the particle-list engines, part1/vecmp.cpp:25-32).
    _phase_disable = None

    def step_carry(self, carry: Carry) -> Carry:
        cfg = self.config
        off = self._phase_disable
        if off in ("force", "force+move"):
            accel = jnp.zeros_like(carry.pos)
        elif cfg.ndim == 2:
            accel = all_pairs_accel(carry.pos, accel_fn_for(cfg))
        else:
            accel = all_pairs_accel_vec(carry.pos, accel_vec_fn_for(cfg))
        if off == "force+move":
            pos, vel = carry.pos, carry.vel
        else:
            pos, vel = verlet_step(carry.pos, carry.vel, accel, cfg.dt, cfg.size)
        return Carry(pos, vel, carry.pid, carry.monitors)

    # Oracle never permutes particles; skip the id scatter.
    def frame_of(self, carry):
        return carry.pos

    def final_state(self, carry):
        from ppsim_tpu.state import ParticleState

        return ParticleState(carry.pos, carry.vel)
