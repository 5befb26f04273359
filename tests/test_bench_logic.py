"""Pure-logic tests for bench.py (no engine runs, no device).

bench.py is the driver-run headline benchmark; its tuned-cadence
decision (rebin_every=11 only in the exact validated regime, with a
monitor fallback) must never silently widen. Import by path — the repo
root is not necessarily on sys.path under pytest."""

import argparse
import importlib.util
import pathlib

_spec = importlib.util.spec_from_file_location(
    "bench_headline", pathlib.Path(__file__).resolve().parent.parent / "bench.py"
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _args(**over):
    base = dict(n=20_971_520, steps=1000, engine="pallas", repeats=3,
                quick=False, ndim=2, density=None, force_law=None, dt=None,
                grid3_capacity=None, rebin_every=None, chunk_steps=None)
    base.update(over)
    return argparse.Namespace(**base)


def test_tuned_cadence_on_the_headline_config():
    assert bench.TUNED_CADENCE == 11  # r4 A/B: 946.8M vs 941.3M at cadence 10
    assert bench.tuned_cadence_applies(_args())


def test_tuned_cadence_only_in_the_validated_regime():
    # Any explicit cadence wins.
    assert not bench.tuned_cadence_applies(_args(rebin_every=8))
    assert not bench.tuned_cadence_applies(_args(rebin_every=11))
    # 3D / non-flagship engines / quick smoke keep config defaults.
    assert not bench.tuned_cadence_applies(_args(ndim=3))
    assert not bench.tuned_cadence_applies(_args(engine="grid"))
    assert not bench.tuned_cadence_applies(_args(quick=True))
    # Chunked runs must stay cadence-aligned with the chunk length.
    assert not bench.tuned_cadence_applies(_args(chunk_steps=200))
    # Sub-1M sizes were never A/B'd at the tuned cadence.
    assert not bench.tuned_cadence_applies(_args(n=262_144))
    # Tiny step counts (smoke-sized) keep the default; full-length runs
    # need no cadence alignment (the static driver composes partial
    # rebin periods bit-identically — 1000 % 11 != 0 IS the headline).
    assert not bench.tuned_cadence_applies(_args(steps=50))
    assert bench.tuned_cadence_applies(_args(steps=1004))


def test_transient_retry_strips_explicit_retries_flag():
    # The retry path re-invokes bench.py with --retries decremented; the
    # marker list is what classifies a relay crash as transient.
    assert "crashed or restarted" in bench._TRANSIENT_MARKERS
    assert "UNAVAILABLE" in bench._TRANSIENT_MARKERS


def test_wait_for_device_succeeds_on_cpu_and_bounds_failures():
    import os
    import sys

    # Success path: a CPU-forced probe subprocess round-trips a computation
    # (strip the axon relay hook so the probe cannot hang on an outage —
    # the real bench run keeps the inherited env and probes the relay).
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    assert bench.wait_for_device(tries=1, probe_timeout=300, env=env)

    # Failure path is BOUNDED and non-raising: a probe interpreter that
    # exits nonzero immediately exhausts its tries and returns False
    # (bench then proceeds; the old behavior, minus the unbounded hang).
    # The interpreter is injected — mutating the global sys.executable
    # would race with anything else reading it (r3 advisor finding).
    assert not bench.wait_for_device(tries=2, probe_timeout=5,
                                     first_probe_timeout=5, sleep_s=0.0,
                                     env=env, executable="/bin/false")
    assert sys.executable != "/bin/false"

    # tries <= 0 skips the preflight entirely (no probe, no misleading
    # "probe 1/0 failed" print — r3 advisor finding).
    assert not bench.wait_for_device(tries=0, env=env,
                                     executable="/bin/false")


def test_no_tuned_3d_cadence_is_deliberate():
    # r5: the 3D cadence A/B measured cadence 2 (auto) as the winner, and
    # the deferral-style init spill made the plain AUTO config the fastest
    # measured 3D headline (229.2M p-s/s vs 223.8M for the explicit-
    # cadence geometry flip, "ab": "init_spill" rows) — so the 3D headline
    # ships config defaults and there is no TUNED_CADENCE3 to drift.
    assert not hasattr(bench, "TUNED_CADENCE3")
    assert not hasattr(bench, "tuned_cadence3_applies")
    # The 2D machinery must not have widened to 3D in the process.
    assert not bench.tuned_cadence_applies(_args(ndim=3, engine="pallas3d"))
