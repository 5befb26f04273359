"""Pure physics functions: pair force, Verlet integration, wall reflection.

Physics contract (reference: part1/serial.cpp:19-71, identical in
reference.cpp / openmp.cpp / vecmp.cpp / mpi.cpp / gpu.cu):

- pair force: purely repulsive radial force between particles within
  ``cutoff``; with ``r2 = max(dx^2+dy^2, min_r^2)``, ``r = sqrt(r2)``,
  ``coef = (1 - cutoff/r) / r2 / mass``, acceleration += ``coef * (dx, dy)``.
  Forces are one-way (each particle gathers from all neighbors; Newton's
  third law deliberately NOT exploited, matching the reference).
- integration: simplified velocity Verlet ``v += a*dt; x += v*dt``
  (part1/serial.cpp:47-50).
- walls: mirror position and negate velocity, repeated while out of the box
  (part1/serial.cpp:53-61). Here the while-loop is replaced by the exact
  closed form of iterated mirroring: folding x into the period-2L triangular
  wave, with the velocity sign flipped on odd reflections. Branch-free, same
  fixed point, handles any number of bounces per step.

All functions are shape-polymorphic and dtype-preserving; they are used by
every engine (oracle, binned, sharded, Pallas).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "pair_accel",
    "coef_from_r2",
    "lj_coef_from_r2",
    "accel_from_deltas",
    "lj_accel_from_deltas",
    "accel_fn_for",
    "accel_vec_fn_for",
    "verlet_step",
    "reflect_walls",
]


def coef_from_r2(r2, cutoff: float, min_r: float, mass: float):
    """Repulsive pair coefficient from the squared distance: the acceleration
    contribution is ``coef * d`` componentwise (dimension-agnostic core of
    the force law, reference: part1/serial.cpp:19-36)."""
    dtype = jnp.result_type(r2)
    cutoff = jnp.asarray(cutoff, dtype)
    min_r2 = jnp.asarray(min_r * min_r, dtype)
    mass = jnp.asarray(mass, dtype)

    in_range = r2 <= cutoff * cutoff
    r2c = jnp.maximum(r2, min_r2)
    r = jnp.sqrt(r2c)
    coef = (1.0 - cutoff / r) / r2c / mass
    return jnp.where(in_range, coef, jnp.zeros_like(coef))


def lj_coef_from_r2(r2, cutoff: float, min_r: float, mass: float,
                    epsilon: float, sigma: float):
    """Truncated Lennard-Jones pair coefficient from the squared distance:
    coef = -24 eps (2 (sigma/r)^12 - (sigma/r)^6) / r^2 / mass
    (repulsive inside r_min = 2^(1/6) sigma, attractive outside), truncated
    at ``cutoff``, with the reference's ``min_r`` distance clamp."""
    dtype = jnp.result_type(r2)
    cutoff = jnp.asarray(cutoff, dtype)
    min_r2 = jnp.asarray(min_r * min_r, dtype)

    in_range = r2 <= cutoff * cutoff
    r2c = jnp.maximum(r2, min_r2)
    s2 = jnp.asarray(sigma * sigma, dtype) / r2c
    s6 = s2 * s2 * s2
    coef = -24.0 * epsilon * (2.0 * s6 * s6 - s6) / r2c / mass
    return jnp.where(in_range, coef, jnp.zeros_like(coef))


def accel_from_deltas(dx, dy, cutoff: float, min_r: float, mass: float):
    """Acceleration contribution on a particle from neighbors at offsets (dx, dy).

    ``dx = x_neighbor - x_self`` (reference sign convention,
    part1/serial.cpp:21-22). Returns ``(ax, ay)`` contributions with the same
    shape as the inputs; out-of-cutoff pairs contribute exactly 0. A
    self-pair (dx=dy=0) contributes 0 because the force is radial — the
    reference relies on the same fact (reference.cpp:57-60 interacts i with
    itself).
    """
    coef = coef_from_r2(dx * dx + dy * dy, cutoff, min_r, mass)
    return coef * dx, coef * dy


def lj_accel_from_deltas(dx, dy, cutoff: float, min_r: float, mass: float,
                         epsilon: float, sigma: float):
    """Truncated Lennard-Jones acceleration contribution (plug-in force law,
    same seam as the reference's apply_force, part1/serial.cpp:19-36)."""
    coef = lj_coef_from_r2(dx * dx + dy * dy, cutoff, min_r, mass, epsilon, sigma)
    return coef * dx, coef * dy


def accel_fn_for(config):
    """Pair-acceleration closure ``(dx, dy) -> (ax, ay)`` for a config.

    The engine-side force-law seam: engines call this instead of hard-wiring
    the repulsive law, so alternative potentials (the Lennard-Jones stretch
    variant) plug in without touching engine code.
    """
    if config.force_law == "repulsive":
        return lambda dx, dy: accel_from_deltas(
            dx, dy, config.cutoff, config.min_r, config.mass
        )
    if config.force_law == "lj":
        return lambda dx, dy: lj_accel_from_deltas(
            dx, dy, config.cutoff, config.min_r, config.mass,
            config.lj_epsilon, config.lj_sigma,
        )
    raise ValueError(f"unknown force_law {config.force_law!r}")


def accel_vec_fn_for(config):
    """Dimension-agnostic pair-acceleration closure ``d -> a`` where ``d`` is
    the (..., ndim) displacement ``pos_neighbor - pos_self`` and ``a`` the
    (..., ndim) acceleration contribution. The ND force-law seam used by the
    3D engines; reduces to accel_fn_for's math in 2D (the squared distance is
    summed in axis order, so x then y — identical op order)."""
    if config.force_law == "repulsive":
        coef_of = lambda r2: coef_from_r2(r2, config.cutoff, config.min_r, config.mass)
    elif config.force_law == "lj":
        coef_of = lambda r2: lj_coef_from_r2(
            r2, config.cutoff, config.min_r, config.mass,
            config.lj_epsilon, config.lj_sigma,
        )
    else:
        raise ValueError(f"unknown force_law {config.force_law!r}")

    def accel_vec(d):
        r2 = (d * d).sum(axis=-1)
        return coef_of(r2)[..., None] * d

    return accel_vec


def pair_accel(pos_i, pos_j, cutoff: float, min_r: float, mass: float):
    """Acceleration on particle(s) at ``pos_i`` from neighbor(s) at ``pos_j``.

    Both are (..., 2) arrays broadcastable against each other; returns the
    (..., 2) acceleration contribution.
    """
    d = pos_j - pos_i
    ax, ay = accel_from_deltas(d[..., 0], d[..., 1], cutoff, min_r, mass)
    return jnp.stack([ax, ay], axis=-1)


def reflect_walls(pos, vel, size: float):
    """Reflect positions into [0, size] and flip velocities on odd reflections.

    Exact closed form of the reference's bounce loop (part1/serial.cpp:53-61):
    iterating ``x -> -x`` (x<0) / ``x -> 2L-x`` (x>L) folds x onto the
    period-2L triangular wave ``L - |mod(x, 2L) - L|``; the velocity sign
    after the loop is flipped iff the fold lands on the descending branch
    (``mod(x, 2L) > L``).
    """
    dtype = pos.dtype
    L = jnp.asarray(size, dtype)
    m = jnp.mod(pos, 2.0 * L)  # jnp.mod is non-negative for positive divisor
    folded = L - jnp.abs(m - L)
    flip = m > L
    new_vel = jnp.where(flip, -vel, vel)
    return folded, new_vel


def verlet_step(pos, vel, accel, dt: float, size: float):
    """One simplified-velocity-Verlet step with wall reflection.

    (reference: ``move``, part1/serial.cpp:44-61)
    """
    dtype = pos.dtype
    dt = jnp.asarray(dt, dtype)
    vel = vel + accel * dt
    pos = pos + vel * dt
    return reflect_walls(pos, vel, size)
