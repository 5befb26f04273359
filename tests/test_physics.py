"""Unit tests for the pure physics functions (reference: part1/serial.cpp:19-71)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from ppsim_tpu.physics import accel_from_deltas, pair_accel, reflect_walls, verlet_step

CUTOFF, MIN_R, MASS, DT = 0.01, 0.0001, 0.01, 0.0005


def ref_accel(dx, dy):
    """Literal transcription of the force law for cross-checking."""
    r2 = dx * dx + dy * dy
    if r2 > CUTOFF * CUTOFF:
        return 0.0, 0.0
    r2 = max(r2, MIN_R * MIN_R)
    r = math.sqrt(r2)
    coef = (1 - CUTOFF / r) / r2 / MASS
    return coef * dx, coef * dy


@pytest.mark.parametrize(
    "dx,dy",
    [
        (0.005, 0.0),
        (0.0, -0.003),
        (0.004, 0.004),
        (0.0099, 0.0),       # just inside cutoff
        (0.0101, 0.0),       # just outside -> zero
        (1e-6, 0.0),         # below min_r clamp
        (0.0, 0.0),          # self-pair -> exactly zero
        (0.007, -0.0071),
    ],
)
def test_force_law_matches_reference(dx, dy):
    ax, ay = accel_from_deltas(
        jnp.float64(dx) if False else jnp.asarray(dx, jnp.float32),
        jnp.asarray(dy, jnp.float32),
        CUTOFF,
        MIN_R,
        MASS,
    )
    ex, ey = ref_accel(dx, dy)
    assert np.isfinite(float(ax)) and np.isfinite(float(ay))
    np.testing.assert_allclose(float(ax), ex, rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(float(ay), ey, rtol=2e-5, atol=1e-3)


def test_out_of_cutoff_is_exactly_zero():
    ax, ay = accel_from_deltas(
        jnp.asarray(0.02, jnp.float32), jnp.asarray(0.0, jnp.float32),
        CUTOFF, MIN_R, MASS,
    )
    assert float(ax) == 0.0 and float(ay) == 0.0


def test_pair_accel_broadcasting():
    pos_i = jnp.zeros((4, 1, 2), jnp.float32)
    pos_j = jnp.asarray(np.random.default_rng(0).uniform(0, 0.02, (1, 7, 2)), jnp.float32)
    out = pair_accel(pos_i, pos_j, CUTOFF, MIN_R, MASS)
    assert out.shape == (4, 7, 2)


def ref_bounce(x, v, size):
    """Literal transcription of the reference wall loop (serial.cpp:53-61)."""
    while x < 0 or x > size:
        x = -x if x < 0 else 2 * size - x
        v = -v
    return x, v


@pytest.mark.parametrize(
    "x,v",
    [
        (-0.003, -1.0),
        (0.708, 1.0),
        (0.1, 0.5),          # in box: untouched
        (-1.5, -2.0),        # multiple bounces
        (2.3, 3.0),          # multiple bounces
        (0.0, -1.0),         # exactly on wall: stays
    ],
)
def test_wall_reflection_closed_form_matches_loop(x, v):
    size = 0.707
    pos = jnp.asarray([[x, 0.1]], jnp.float32)
    vel = jnp.asarray([[v, 0.2]], jnp.float32)
    new_pos, new_vel = reflect_walls(pos, vel, size)
    ex, ev = ref_bounce(x, v, size)
    np.testing.assert_allclose(float(new_pos[0, 0]), ex, atol=1e-6)
    np.testing.assert_allclose(float(new_vel[0, 0]), ev, atol=1e-6)
    # y untouched
    assert float(new_pos[0, 1]) == pytest.approx(0.1)
    assert float(new_vel[0, 1]) == pytest.approx(0.2)


def test_verlet_step_order():
    # v += a dt THEN x += v dt (reference order, serial.cpp:47-50).
    pos = jnp.asarray([[0.1, 0.1]], jnp.float32)
    vel = jnp.asarray([[1.0, 0.0]], jnp.float32)
    acc = jnp.asarray([[2.0, 0.0]], jnp.float32)
    new_pos, new_vel = verlet_step(pos, vel, acc, DT, 1.0)
    assert float(new_vel[0, 0]) == pytest.approx(1.0 + 2.0 * DT)
    assert float(new_pos[0, 0]) == pytest.approx(0.1 + (1.0 + 2.0 * DT) * DT)
