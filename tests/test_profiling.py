"""phase_times: the vecmp t1..t4 analog (part1/vecmp.cpp:25-32,178-183)
must cover the whole slab family — 2D/3D, single-chip and sharded (r3
verdict: only the 2D single-chip grid family was supported).

Timing magnitudes are not assertable on a contended 1-core host; what is
deterministic is (a) the phase dict's structure/consistency and (b) that
each variant seam actually disables its phase (positions frozen without
the move phase; bins frozen without the rebin phase)."""

import dataclasses

import jax
import numpy as np
import pytest

from ppsim_tpu.engines import get_engine
from ppsim_tpu.initlib import init_particles
from ppsim_tpu.profiling import phase_times


def _assert_phase_dict(d):
    assert set(d) == {"step", "force+move", "rebin", "overhead"}
    assert d["step"] > 0
    for v in d.values():
        assert v >= 0.0
    # No sum constraint: on a contended 1-core host the variant timings
    # can be noisier than the phases themselves; phase MAGNITUDES are a
    # TPU-side measurement (BASELINE.md), not a CI property.


def test_phase_times_grid_engine(tiny_grid_config):
    st = init_particles(tiny_grid_config, seed=42, method="fast")
    d = phase_times(get_engine("grid", tiny_grid_config), st, steps=6)
    _assert_phase_dict(d)


def test_phase_times_sharded_grid(tiny_grid_config):
    from ppsim_tpu.engines.sharded_grid import ShardedGridEngine

    cfg = tiny_grid_config
    st = init_particles(cfg, seed=42, method="fast")
    eng = ShardedGridEngine(cfg, devices=jax.devices()[:2], impl="xla")
    d = phase_times(eng, st, steps=6)
    _assert_phase_dict(d)
    assert eng._phase_disable is None  # seam restored


def test_phase_disable_seams_disable_the_phases(tiny_grid_config):
    """The sharded family's trace-time flag seam must actually cut the
    phase out of the compiled program, not just relabel it."""
    from ppsim_tpu.engines.sharded_grid import ShardedGridEngine

    cfg = dataclasses.replace(tiny_grid_config, rebin_every=1)
    st = init_particles(cfg, seed=42, method="fast")
    eng = ShardedGridEngine(cfg, devices=jax.devices()[:2], impl="xla")
    carry = eng.init_carry(st)

    eng._phase_disable = "move"
    try:
        c2 = jax.jit(eng.step_carry)(carry)  # rebin of an unmoved state
        np.testing.assert_array_equal(
            np.asarray(carry.slab.xl), np.asarray(c2.slab.xl)
        )
    finally:
        eng._phase_disable = None

    eng._phase_disable = "rebin"
    try:
        c3 = jax.jit(eng.step_carry)(carry)  # move without the rebin
        # pid planes untouched = no bin relocation happened
        np.testing.assert_array_equal(
            np.asarray(carry.slab.pid), np.asarray(c3.slab.pid)
        )
        assert not np.array_equal(
            np.asarray(carry.slab.xl), np.asarray(c3.slab.xl)
        )
    finally:
        eng._phase_disable = None


@pytest.mark.slow
def test_phase_times_3d_and_sharded3d(grid3_test_config=None):
    """3D single-chip + sharded coverage (slow: the 3D rebin program is an
    ~8-min compile on the 1-core host)."""
    from ppsim_tpu.config import SimConfig
    from ppsim_tpu.engines.sharded_grid3d import ShardedGrid3DEngine

    cfg = SimConfig(num_parts=400, ndim=3, density=7e-6, grid3_capacity=6,
                    evac_capacity=2)
    st = init_particles(cfg, seed=42, method="fast")
    d = phase_times(get_engine("grid3d", cfg), st, steps=4)
    _assert_phase_dict(d)
    eng = ShardedGrid3DEngine(cfg, devices=jax.devices()[:2], impl="xla")
    d = phase_times(eng, st, steps=4)
    _assert_phase_dict(d)
    assert eng._phase_disable is None


def test_phase_times_particle_list_engines(small_config):
    """r4 verdict #7: the particle-list engines (oracle/binned/sharded)
    report force vs move through the same trace-time seam; no rebin phase
    (bins rebuild inside the fused sort step — the sort cost lands in
    "other")."""
    import jax

    from ppsim_tpu.engines.sharded import ShardedEngine

    st = init_particles(small_config, seed=42, method="fast")
    for name in ("oracle", "binned"):
        eng = get_engine(name, small_config)
        d = phase_times(eng, st, steps=4)
        assert set(d) == {"step", "force", "move", "other"}
        assert d["step"] > 0 and all(v >= 0.0 for v in d.values())
        assert eng._phase_disable is None  # seam restored

    eng = ShardedEngine(small_config, devices=jax.devices()[:2])
    d = phase_times(eng, st, steps=4)
    assert set(d) == {"step", "force", "move", "other"}
    assert eng._phase_disable is None


def test_particle_phase_seams_disable_the_phases(small_config):
    """The seams must actually change the compiled program: "force" freezes
    accelerations (ballistic step), "force+move" freezes the state."""
    import jax

    eng = get_engine("binned", small_config)
    st = init_particles(small_config, seed=42, method="fast")
    carry = eng.init_carry(st)

    eng._phase_disable = "force+move"
    try:
        c2 = jax.jit(eng.step_carry)(carry)
        # sort may permute rows; per-pid state must be unchanged
        a = np.asarray(eng.final_state(carry).pos)
        b = np.asarray(eng.final_state(c2).pos)
        np.testing.assert_array_equal(a, b)
    finally:
        eng._phase_disable = None

    eng._phase_disable = "force"
    try:
        c3 = jax.jit(eng.step_carry)(carry)  # ballistic: x += v dt exactly
        moved = np.asarray(eng.final_state(c3).pos)
        ballistic = np.asarray(eng.final_state(carry).pos) + \
            np.asarray(eng.final_state(carry).vel) * small_config.dt
        np.testing.assert_allclose(moved, ballistic, atol=1e-7)
    finally:
        eng._phase_disable = None
