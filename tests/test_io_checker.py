"""Trajectory format, checkpointing, and correctness-checker tests."""

import numpy as np
import pytest

from ppsim_tpu.checker import check_frames, check_trajectory
from ppsim_tpu.config import SimConfig
from ppsim_tpu.engines import get_engine
from ppsim_tpu.initlib import init_particles
from ppsim_tpu.io import (
    load_checkpoint,
    read_trajectory,
    save_checkpoint,
    write_trajectory,
)
from ppsim_tpu.state import ParticleState


def test_trajectory_roundtrip(tmp_path):
    frames = np.random.default_rng(0).uniform(0, 0.7, (3, 10, 2))
    path = str(tmp_path / "t.txt")
    write_trajectory(path, frames, 0.707107)
    back, size = read_trajectory(path)
    assert back.shape == (3, 10, 2)
    assert size == pytest.approx(0.707107, rel=1e-6)
    np.testing.assert_allclose(back, frames, rtol=1e-5)  # 6 sig digits


def test_trajectory_header_format(tmp_path):
    path = str(tmp_path / "t.txt")
    write_trajectory(path, np.zeros((1, 2, 2)), 0.5)
    lines = open(path).read().split("\n")
    assert lines[0] == "2 0.5"  # "<n> <size>" (reference: part1/main.cpp:19)
    assert lines[1] == "0 0"
    assert lines[3] == ""  # blank line after each frame


def test_checker_passes_on_real_run(tmp_path, small_config):
    cfg = small_config
    state = init_particles(cfg, seed=42, method="reference")
    res = get_engine("binned", cfg).run(state, nsteps=80, savefreq=10)
    result = check_frames(res.frames, cfg)
    assert result.passed, str(result)

    # and through the file path
    path = str(tmp_path / "traj.txt")
    write_trajectory(path, res.frames, cfg.size)
    assert check_trajectory(path, cfg).passed


@pytest.mark.parametrize("dim", [2, 3])
def test_cell_list_stats_match_brute_force(dim):
    """The large-frame cell-list fast paths must agree exactly with the
    O(N^2) trust anchor (same pairs found; sums match to fp roundoff) —
    including coincident-particle (duplication-bug) frames."""
    from ppsim_tpu.checker import (
        _cell_list_stats, _cell_list_stats3, frame_distance_stats,
    )

    rng = np.random.default_rng(3)
    cutoff = 0.01
    side = 0.12
    pos = rng.uniform(0, side, (800, dim))
    # add a tight cluster so interacting pairs certainly exist
    pos[:40] = 0.05 + rng.uniform(0, cutoff, (40, dim))

    bm, bs, bc = frame_distance_stats(pos, cutoff)  # n below fast-path cut
    fast = _cell_list_stats if dim == 2 else _cell_list_stats3
    fm, fs, fc = fast(pos, cutoff)
    if dim == 3:
        # 3D path counts each unordered pair once; brute force counts twice
        fs, fc = 2 * fs, 2 * fc
    assert fc == bc
    assert fm == pytest.approx(bm, rel=1e-12)
    assert fs == pytest.approx(bs, rel=1e-9)

    # coincident particles: absmin must collapse to 0 in both paths
    pos[7] = pos[3]
    bm2, _, _ = frame_distance_stats(pos, cutoff)
    fm2, _, _ = fast(pos, cutoff)
    assert bm2 == 0.0 and fm2 == 0.0


def test_checker_fails_on_overlapping_particles(small_config):
    cfg = small_config
    # all particles piled near one point -> absmin collapses
    frames = np.full((2, 50, 2), 0.35) + np.random.default_rng(1).uniform(
        0, 0.001, (2, 50, 2)
    )
    result = check_frames(frames, cfg)
    assert not result.passed


def test_checkpoint_roundtrip(tmp_path, small_config):
    cfg = small_config
    state = init_particles(cfg, seed=42, method="reference")
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, state, step=370, config=cfg)
    back, step, meta = load_checkpoint(path)
    assert step == 370
    assert meta["num_parts"] == cfg.num_parts
    np.testing.assert_array_equal(np.asarray(back.pos), np.asarray(state.pos))
    np.testing.assert_array_equal(np.asarray(back.vel), np.asarray(state.vel))


def test_resume_continues_identically(small_config, tmp_path):
    """Checkpoint/resume is a strict superset of the reference's save format
    (which loses velocities, part1/main.cpp:15-28): resuming reproduces the
    uninterrupted run bit-for-bit."""
    cfg = small_config
    state = init_particles(cfg, seed=42, method="reference")
    eng = get_engine("binned", cfg)

    full = eng.run(state, nsteps=40)
    half = eng.run(state, nsteps=20)
    resumed = eng.run(ParticleState(half.state.pos, half.state.vel), nsteps=20)
    np.testing.assert_array_equal(
        np.asarray(full.state.pos), np.asarray(resumed.state.pos)
    )
    np.testing.assert_array_equal(
        np.asarray(full.state.vel), np.asarray(resumed.state.vel)
    )
