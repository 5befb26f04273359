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


def test_float64_binned_tracks_native_much_tighter_than_f32():
    """--dtype float64 must be REAL (r3 verdict: it silently ran f32): in a
    subprocess with x64 enabled, the f64 binned trajectory tracks the native
    f64 cells oracle ~5 orders tighter than the f32 path's 1e-4 band, and
    the saved frames actually carry float64. Subprocess because
    jax_enable_x64 is process-global and would poison this suite's f32
    jit caches."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = """
from ppsim_tpu.testing import force_cpu_devices; force_cpu_devices(8)
import jax; jax.config.update("jax_enable_x64", True)
import numpy as np
from ppsim_tpu import native
from ppsim_tpu.config import SimConfig
from ppsim_tpu.engines import get_engine
from ppsim_tpu.state import make_state

cfg = SimConfig(num_parts=400, dtype="float64")
pos, vel = native.native_init(400, cfg.size, 42)
state = make_state(pos, vel, dtype=cfg.jnp_dtype)
assert np.asarray(state.pos).dtype == np.float64
res = get_engine("binned", cfg).run(state, nsteps=10, savefreq=5)
assert np.asarray(res.frames).dtype == np.float64, res.frames.dtype
npos, _ = native.native_run(pos, vel, cfg, 10, engine="cells")
err = float(np.abs(np.asarray(res.state.pos) - npos).max())
# f64-vs-f64 independent implementations: summation order differs, so not
# bitwise — but far tighter than the f32 path's 1e-4 (test above).
assert err < 1e-9, err
print("F64OK", err)
"""
    env = dict(os.environ)
    env["PYTHONPATH"] = env.get("PYTHONPATH", "") + os.pathsep + repo
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "F64OK" in r.stdout


def test_float64_requires_x64_and_slab_engines_reject_it():
    """In THIS process x64 is off: building a float64 config must raise
    loudly (never truncate silently), and the f32-only slab family must
    reject an f64 config with a clear redirect."""
    import jax

    assert not jax.config.jax_enable_x64
    with pytest.raises(RuntimeError, match="jax_enable_x64"):
        SimConfig(num_parts=100, dtype="float64")
    with pytest.raises(ValueError, match="float32 | float64"):
        SimConfig(num_parts=100, dtype="bfloat16")
    # Slab engines check the dtype field itself (object.__setattr__ dodges
    # __post_init__'s x64 gate, standing in for an x64-enabled process).
    cfg64 = SimConfig(num_parts=100)
    object.__setattr__(cfg64, "dtype", "float64")
    with pytest.raises(ValueError, match="float32-only"):
        get_engine("grid", cfg64)
    cfg3_64 = SimConfig(num_parts=100, ndim=3, density=7e-6)
    object.__setattr__(cfg3_64, "dtype", "float64")
    with pytest.raises(ValueError, match="float32-only"):
        get_engine("grid3d", cfg3_64)


def test_native_frame_stats_matches_numpy_checker_paths():
    """The native checker kernel must agree with BOTH independent numpy
    cell-list passes (2D double-counts pairs, 3D and native count each
    unordered pair once — absmin/absavg are invariant to that choice)."""
    from ppsim_tpu.checker import _cell_list_stats, _cell_list_stats3
    from ppsim_tpu.native import native_frame_stats

    rng = np.random.default_rng(7)
    n = 30_000
    pos2 = rng.uniform(0, np.sqrt(0.0005 * n), (n, 2))
    nat = native_frame_stats(pos2, 0.01)
    ref = _cell_list_stats(pos2, 0.01)
    assert nat is not None
    assert nat[0] == ref[0]
    assert nat[2] * 2 == ref[2]
    np.testing.assert_allclose(nat[1] * 2, ref[1], rtol=1e-12)

    pos3 = rng.uniform(0, (7e-6 * n) ** (1 / 3), (n, 3))
    nat3 = native_frame_stats(pos3, 0.01)
    ref3 = _cell_list_stats3(pos3, 0.01)
    assert nat3[0] == ref3[0] and nat3[2] == ref3[2]
    np.testing.assert_allclose(nat3[1], ref3[1], rtol=1e-12)


def test_native_frame_stats_edge_cases():
    from ppsim_tpu.native import native_frame_stats

    rng = np.random.default_rng(8)
    # duplicated particles (scatter-bug signature) drive absmin to 0
    p = rng.uniform(0, 1.5, (4200, 2))
    dup = np.repeat(np.concatenate([p, p[:3]], axis=0), 5, 0)[:21_000]
    assert native_frame_stats(dup, 0.01)[0] == 0.0
    # no interacting pairs -> (inf, 0, 0)
    far = np.arange(30_000, dtype=np.float64)[:, None] * np.ones((1, 2))
    assert native_frame_stats(far, 0.01) == (float("inf"), 0.0, 0)


def test_check_frames_uses_native_and_numpy_identically():
    """check_frames must produce the same verdict and statistics whether the
    large-frame path runs native or numpy (use_native toggle)."""
    from ppsim_tpu.checker import frame_distance_stats

    rng = np.random.default_rng(9)
    n = 25_000
    pos = rng.uniform(0, np.sqrt(0.0005 * n), (n, 2))
    m_nat, s_nat, c_nat = frame_distance_stats(pos, 0.01, use_native=True)
    m_np, s_np, c_np = frame_distance_stats(pos, 0.01, use_native=False)
    assert m_nat == m_np
    # counting convention differs (single vs double); the averages must match
    np.testing.assert_allclose(s_nat / c_nat, s_np / c_np, rtol=1e-12)
