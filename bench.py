#!/usr/bin/env python
"""Headline benchmark: particle-steps/sec of the flagship (pallas) engine.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline (BASELINE.md): the reference's CUDA part3 on a Tesla P100 runs its
largest config, n=16,384,000 x 1000 steps, in 50.85 s (part3 PDF Tables 1&3)
— 322.2 M particle-steps/sec. ``vs_baseline`` is our sustained
particle-steps/sec divided by that. Timing follows the reference contract
(part1/main.cpp:118-143): engine init + all steps, excluding jit compile
(the C++ builds are AOT-compiled too) and excluding particle initialization.

The timed region runs ``--repeats`` times in one process on one compiled
program; ``value`` is the BEST run (relayed TPUs share the wire with other
tenants, so single-shot timings vary severalfold under contention — round 1's
single-shot numbers spanned 176-617 M p-s/s for the identical program). The
per-run seconds, the relative spread, and the safety-monitor state are all
included in the JSON so a regression (or a noisy capture) is visible, not
silent.

Usage:
    python bench.py                  # full: n=20.97M x 1000 steps, best of 3
    python bench.py --quick          # small smoke (n=262144 x 200)
    python bench.py -n 4194304 --steps 1000 --repeats 5 --baseline 331.3e6
"""

import argparse
import json
import sys

P100_PSTEPS_BEST = 16_384_000 * 1000 / 50.85  # 322.2M, part3 PDF Tables 1&3

# The relayed TPU's worker process dies intermittently under long single
# executions and occasionally on startup (CLAUDE.md "relay execution-kill");
# after such a crash the in-process JAX backend is unusable, so recovery
# means a FRESH process. main() retries itself in a subprocess when the
# failure looks like that transient class, so one relay hiccup doesn't
# turn into a missing benchmark record.
_TRANSIENT_MARKERS = ("UNAVAILABLE", "crashed or restarted", "DEADLINE_EXCEEDED",
                      "Socket closed", "failed to connect",
                      # Degraded compile-helper runs (chipless AOT with a
                      # pathological layout; per-request luck — CLAUDE.md).
                      # The harness warm phases already retry these
                      # in-process (harness._warm_with_retry); this is the
                      # fresh-process backstop when those retries exhaust.
                      "remote_compile", "tpu_compile_helper")

_PROBE_CODE = (
    "import jax, numpy as np\n"
    "x = jax.jit(lambda a: a + 1)(np.ones(8, np.float32))\n"
    "assert float(np.asarray(x)[0]) == 2.0\n"
)


def wait_for_device(tries: int = 5, probe_timeout: float = 120.0,
                    sleep_s: float = 150.0, env=None,
                    first_probe_timeout: float = 600.0,
                    executable: str = None) -> bool:
    """Bounded wait for a usable accelerator before the timed measurement.

    Relay outages (CLAUDE.md: hours-long windows with no device init at
    all) make the FIRST device touch hang rather than raise, so the
    in-process transient-retry path never fires — the whole benchmark
    process just stalls. Probe in a disposable subprocess with a hard
    timeout instead: a hung probe is killed and retried after a pause, and
    after ``tries`` failures we proceed anyway (the main path then reports
    whatever error the backend gives, same as before this guard). Returns
    True when a probe round-tripped a computation on the device; False
    when probing was skipped (``tries <= 0``) or every probe failed.

    The FIRST probe gets ``first_probe_timeout`` (default 10 min, the
    documented ceiling of a cold serialized remote compile) so a healthy
    but cold/busy relay isn't misdiagnosed as an outage; later probes use
    the shorter ``probe_timeout`` — the probe program is compile-cached
    after the first round trip, so a slow SECOND probe really is outage-
    shaped. ``executable`` overrides the probing interpreter (tests).
    """
    import subprocess
    import time

    if tries <= 0:
        return False
    exe = executable or sys.executable
    for i in range(tries):
        timeout = first_probe_timeout if i == 0 else probe_timeout
        try:
            r = subprocess.run([exe, "-c", _PROBE_CODE],
                               timeout=timeout, env=env,
                               capture_output=True)
            if r.returncode == 0:
                return True
            detail = (r.stderr or b"").decode(errors="replace").strip()
            detail = detail.splitlines()[-1][:160] if detail else "nonzero exit"
        except subprocess.TimeoutExpired:
            detail = f"probe hung > {timeout:g}s (relay outage?)"
        if i < tries - 1:
            print(f"bench.py: device probe {i + 1}/{tries} failed "
                  f"({detail}); retrying in {sleep_s:g}s", file=sys.stderr)
            time.sleep(sleep_s)
        else:
            print(f"bench.py: device probe {i + 1}/{tries} failed "
                  f"({detail}); proceeding anyway", file=sys.stderr)
    return False


TUNED_CADENCE = 11

# There is deliberately NO tuned 3D cadence (r5). The 3D cadence A/B at
# 20.97M measured cadence 2 at 223.8M p-s/s — but setting rebin3_every
# explicitly also flips Geometry3S.for_config to the zs=256 candidate,
# and the deferral-style init spill (ops/grid3d_ops) then made the plain
# AUTO config faster still: 229.2M p-s/s at the chooser capacity 11 on
# the auto [205,208,128] geometry, same session as a 175.6M raise-arm
# anchor that reproduced the earlier sessions' number exactly
# ("ab": "init_spill" rows, bench/results_tpu3d.jsonl). Auto cadence is
# already the A/B winner (2), so the 3D headline ships config defaults.


def tuned_cadence_applies(args) -> bool:
    """Whether the measured headline cadence (rebin_every=11) applies.

    Only the exact validated regime: the 2D pallas flagship at >=1M
    particles, no explicit cadence/chunking override, full-length
    (non-quick) runs. Everything else runs the config default. The static
    run driver composes partial rebin periods bit-identically, so the step
    count needs no cadence alignment. Unit-tested in
    tests/test_bench_logic.py."""
    return (args.rebin_every is None and args.ndim == 2
            and args.engine == "pallas" and args.chunk_steps is None
            and not args.quick and args.n >= 1_000_000
            and args.steps >= 100)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=20_971_520)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--engine", default="pallas")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--baseline", type=float, default=P100_PSTEPS_BEST,
                    help="baseline particle-steps/sec to compare against")
    # Stretch-config axes (same flags as bench/sweep.py): the headline tool
    # can drive the 3D / Lennard-Jones flagship too, e.g.
    #   python bench.py --engine pallas3d --ndim 3 --density 7e-6 \
    #       --grid3-capacity 11 --chunk-steps 100
    ap.add_argument("--ndim", type=int, default=2)
    ap.add_argument("--density", type=float, default=None)
    ap.add_argument("--force-law", default=None, help="repulsive | lj")
    ap.add_argument("--dt", type=float, default=None)
    ap.add_argument("--grid3-capacity", type=int, default=None)
    # Rebin cadence. Default for the 2D flagship headline: 11 — the
    # one-process A/B at n=20.97M on the snapped cap-14 geometry measured
    # cadence 11 at 946.8M p-s/s vs 941.3M at cadence 10 (r4,
    # "ab": "rebin_cadence" rows) and cadence 10 at 940.9M vs 927.3M at
    # the config default 8 (r3), zero drops everywhere, drift margin
    # 0.0203 < slack 0.0258 at the worst observed max|v|; cadence 12
    # tripped the deferral-pressure drop monitor and is rejected
    # (bench/results_tpu.jsonl). If a monitor trips at the tuned cadence,
    # _measure falls back to the config default and records that in the
    # JSON.
    ap.add_argument("--rebin-every", type=int, default=None)
    ap.add_argument("--chunk-steps", type=int, default=None,
                    help="N async invocations of one compiled chunk program "
                         "(the relay worker dies under ~minute-long single "
                         "executions; timing contract unchanged)")
    ap.add_argument("--retries", type=int, default=2,
                    help="fresh-process retries after a transient relay/TPU "
                         "failure (0 disables)")
    ap.add_argument("--wait-tries", type=int, default=5,
                    help="bounded device-availability probes before measuring "
                         "(relay outages HANG device init; the first probe is "
                         "a 600s-capped subprocess — a cold remote compile "
                         "can take minutes — later ones 120s, 150s between "
                         "probes; 0 skips the preflight)")
    args = ap.parse_args(argv)
    if args.quick:
        args.n, args.steps = 262_144, 200
    if args.wait_tries > 0:
        wait_for_device(tries=args.wait_tries)

    try:
        return _measure(args)
    except Exception as e:  # noqa: BLE001 — classify, retry transients only
        msg = f"{type(e).__name__}: {e}"
        if args.retries <= 0 or not any(m in msg for m in _TRANSIENT_MARKERS):
            raise
        print(f"bench.py: transient TPU/relay failure, retrying in a fresh "
              f"process ({args.retries} left): {msg.splitlines()[0][:200]}",
              file=sys.stderr)
        import subprocess
        import time
        time.sleep(30)  # give a restarting relay worker a moment
        fwd = [a for a in (sys.argv[1:] if argv is None else argv)]
        # strip any explicit --retries so the decremented value wins
        for i, a in enumerate(fwd):
            if a == "--retries":
                del fwd[i:i + 2]
                break
            if a.startswith("--retries="):
                del fwd[i]
                break
        child = subprocess.run(
            [sys.executable, __file__, *fwd, f"--retries={args.retries - 1}"]
        )
        return child.returncode


def _measure(args) -> int:
    from ppsim_tpu.config import SimConfig
    from ppsim_tpu.engines import get_engine
    from ppsim_tpu.harness import timed_run_repeats
    from ppsim_tpu.initlib import init_particles

    # --rebin-every maps to the dimension's cadence field (rebin3_every in
    # 3D), same as the CLI harness.
    cadence_key = "rebin_every" if args.ndim == 2 else "rebin3_every"
    kw = {k: v for k, v in (("density", args.density),
                            ("force_law", args.force_law),
                            ("dt", args.dt),
                            ("grid3_capacity", args.grid3_capacity),
                            (cadence_key, args.rebin_every))
          if v is not None}
    if args.ndim != 2:
        kw["ndim"] = args.ndim
        if args.engine == "pallas":
            args.engine = "pallas3d"
    tuned_cadence = tuned_cadence_applies(args)
    if tuned_cadence:
        kw["rebin_every"] = TUNED_CADENCE  # measured win; see --rebin-every
    config = SimConfig(num_parts=args.n, **kw)
    state = init_particles(config, seed=42, method="fast")
    fallback = False
    pack_fallback = False
    while True:
        engine = get_engine(args.engine, config)
        try:
            result, times = timed_run_repeats(engine, state, args.steps, 0,
                                              repeats=args.repeats,
                                              chunk_steps=args.chunk_steps)
        except Exception as e:  # noqa: BLE001 — classify, fall back marked only
            # A degraded-helper window that outlasts the warm retry rejects
            # every 20M sorted-scatter temp (observed >70 min, r5b); the
            # claim pack is the compile-safe program, not another roll of
            # the same one. The fresh-process retry in main() stays the
            # backstop for the OTHER transient classes.
            import dataclasses as _dc

            from ppsim_tpu.harness import _COMPILE_TRANSIENT_MARKERS

            msg = f"{type(e).__name__}: {e}"
            if (not pack_fallback and config.grid_pack_mode == "sort"
                    and any(m in msg for m in _COMPILE_TRANSIENT_MARKERS)):
                print("bench.py: warm retries exhausted; falling back to "
                      "the compile-safe claim pack", file=sys.stderr)
                pack_fallback = True
                config = _dc.replace(config, grid_pack_mode="claim")
                continue
            raise
        try:
            engine.check(result)  # raises if any safety monitor tripped
            break
        except RuntimeError as e:
            if not tuned_cadence or fallback:
                raise
            print(f"bench.py: monitor tripped at the tuned cadence, falling "
                  f"back to the config default: {e}", file=sys.stderr)
            fallback = True
            config = SimConfig(num_parts=args.n,
                               **{k: v for k, v in kw.items()
                                  if k not in ("rebin_every",
                                               "rebin3_every")})
            if pack_fallback:
                import dataclasses as _dc

                config = _dc.replace(config, grid_pack_mode="claim")

    best = min(times)
    psteps = args.n * args.steps / best
    print(
        json.dumps(
            {
                "metric": f"particle_steps_per_sec[{args.engine},n={args.n},steps={args.steps}]",
                "value": round(psteps, 1),
                "unit": "particle-steps/s",
                "vs_baseline": round(psteps / args.baseline, 3),
                "seconds_per_run": [round(t, 3) for t in times],
                "spread": round((max(times) - best) / best, 3),
                "monitors": {
                    "max_bin_count": int(result.monitors.max_bin_count),
                    "dropped": int(result.monitors.migrate_dropped),
                    "deferred": int(result.monitors.deferred),
                    "max_speed": float(result.monitors.max_speed),
                },
                "config": {"rebin_every": (config.rebin_every if args.ndim == 2
                                           else config.rebin3_every),
                           "grid_snap_lanes": config.grid_snap_lanes,
                           "cadence_fallback": fallback,
                           "grid_pack_mode": config.grid_pack_mode},
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
