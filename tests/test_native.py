"""Native C++ ground-truth cross-checks (skipped if g++ is unavailable)."""

import numpy as np
import pytest

from ppsim_tpu import native
from ppsim_tpu.checker import check_frames
from ppsim_tpu.config import SimConfig
from ppsim_tpu.engines import get_engine
from ppsim_tpu.initlib import init_particles_reference
from ppsim_tpu.state import make_state

pytestmark = pytest.mark.skipif(not native.available(), reason="no native lib")


def test_native_init_matches_python_mt19937():
    """Two independent reimplementations of the reference initializer
    (numpy mt19937 in initlib.py, libstdc++ in C++) must agree bit-for-bit."""
    cfg = SimConfig(num_parts=500)
    p1, v1 = init_particles_reference(500, cfg.size, 42)
    p2, v2 = native.native_init(500, cfg.size, 42)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(v1, v2)


def test_native_cells_matches_native_oracle():
    cfg = SimConfig(num_parts=400)
    pos, vel = native.native_init(400, cfg.size, 42)
    p1, v1 = native.native_run(pos, vel, cfg, 50, engine="oracle")
    p2, v2 = native.native_run(pos, vel, cfg, 50, engine="cells")
    np.testing.assert_allclose(p1, p2, atol=1e-12)
    np.testing.assert_allclose(v1, v2, atol=1e-9)


def test_jax_binned_tracks_native_f64_groundtruth():
    """f32 JAX trajectories must stay physically consistent with the f64
    native ground truth: close short-horizon tracking + matched checker
    statistics (the course-checker criterion, SURVEY.md §4)."""
    cfg = SimConfig(num_parts=400)
    pos, vel = native.native_init(400, cfg.size, 42)
    state = make_state(pos, vel, dtype=cfg.jnp_dtype)

    # short horizon: direct tracking
    res = get_engine("binned", cfg).run(state, nsteps=10)
    npos, _ = native.native_run(pos, vel, cfg, 10, engine="cells")
    np.testing.assert_allclose(np.asarray(res.state.pos), npos, atol=1e-4)

    # longer horizon: statistical parity via the distance-band checker
    res = get_engine("binned", cfg).run(state, nsteps=100, savefreq=10)
    jax_stats = check_frames(res.frames, cfg)
    assert jax_stats.passed

    frames = []
    p, v = pos, vel
    for _ in range(10):
        p, v = native.native_run(p, v, cfg, 10, engine="cells")
        frames.append(p)
    nat_stats = check_frames(np.asarray(frames), cfg)
    assert nat_stats.passed
    assert abs(jax_stats.absavg - nat_stats.absavg) < 0.1 * cfg.cutoff
