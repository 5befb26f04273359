"""3D stretch-config tests: oracle vs the cell-list engine, both force laws,
checker + trajectory IO in three dimensions (BASELINE.json configs[4])."""

import numpy as np
import pytest

from ppsim_tpu.config import SimConfig
from ppsim_tpu.engines import get_engine
from ppsim_tpu.initlib import init_particles

# density ~7e-6 gives ~0.6 interacting neighbors per particle in 3D — the
# same collision rate the reference's 2D default produces (SimConfig.ndim
# docstring); the 2D default density would give an effectively collisionless
# (vacuous) 3D test.
BASE3 = dict(ndim=3, density=7e-6, bin_capacity=8)


def cfg3(**kw):
    return SimConfig(num_parts=800, **{**BASE3, **kw})


def test_init_3d_lattice_in_box():
    cfg = cfg3()
    st = init_particles(cfg, seed=42)
    pos = np.asarray(st.pos)
    vel = np.asarray(st.vel)
    assert pos.shape == (800, 3) and vel.shape == (800, 3)
    assert pos.min() > 0.0 and pos.max() < cfg.size
    assert np.abs(vel).max() <= 1.0
    # lattice cells are distinct: no two particles coincide
    assert np.unique(pos, axis=0).shape[0] == 800


def test_binned3d_matches_oracle3d():
    cfg = cfg3()
    st = init_particles(cfg, seed=42)
    r1 = get_engine("oracle", cfg).run(st, nsteps=40, savefreq=10)
    r2 = get_engine("binned3d", cfg).run(st, nsteps=40, savefreq=10)
    np.testing.assert_allclose(r1.frames, r2.frames, atol=1e-6)
    r2.check(cfg)


def test_lj3d_binned_matches_oracle():
    """The full stretch config: 3D + truncated Lennard-Jones."""
    cfg = cfg3(force_law="lj", dt=1e-4)
    st = init_particles(cfg, seed=42)
    r1 = get_engine("oracle", cfg).run(st, nsteps=30, savefreq=10)
    r2 = get_engine("binned3d", cfg).run(st, nsteps=30, savefreq=10)
    np.testing.assert_allclose(r1.frames, r2.frames, atol=1e-6)


def test_3d_trajectory_checker_and_io(tmp_path):
    from ppsim_tpu.checker import check_frames
    from ppsim_tpu.io import read_trajectory, write_trajectory

    cfg = cfg3()
    st = init_particles(cfg, seed=1)
    res = get_engine("binned3d", cfg).run(st, nsteps=60, savefreq=10)
    cres = check_frames(res.frames, cfg)
    assert cres.passed, str(cres)

    path = str(tmp_path / "traj3d.txt")
    write_trajectory(path, res.frames, cfg.size)
    frames, size = read_trajectory(path)
    assert frames.shape == res.frames.shape  # (F, N, 3) roundtrip
    assert abs(size - cfg.size) < 1e-6
    np.testing.assert_allclose(frames, res.frames, atol=1e-5)


def test_3d_dynamics_bounded_and_contained():
    cfg = cfg3()
    st = init_particles(cfg, seed=7)
    res = get_engine("binned3d", cfg).run(st, nsteps=150)
    res.check(cfg)
    pos = np.asarray(res.state.pos)
    vel = np.asarray(res.state.vel)
    assert pos.min() >= 0.0 and pos.max() <= cfg.size
    assert np.abs(vel).max() < 10.0


def test_ndim_engine_guards():
    with pytest.raises(ValueError, match="ndim"):
        get_engine("binned", cfg3())
    with pytest.raises(ValueError, match="ndim"):
        get_engine("binned3d", SimConfig(num_parts=100))
    with pytest.raises(ValueError, match="ndim must be 2 or 3"):
        SimConfig(num_parts=100, ndim=4).validate()
