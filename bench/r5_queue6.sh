#!/bin/bash
# Round-5 queue part 6 (after the spill-pack + tuned-3D-cadence code).
#   S1: 2D LJ headline checker gate, attempt 4. Attempts 1-3 all died in
#       the SAME degraded compile-helper window ("could not determine TPU
#       accelerator type" runs picking a 21.5 GB T(8,128) layout for the
#       pack sort's f32[2,n,8] temporary); a stage-by-stage rerun at
#       09:40Z compiled and ran every piece cleanly, so the pack/segment/
#       frame programs are now compile-cached and the gate should clear.
#       Expect the r5 2D self-heal to fire mid-gate (LJ outgrew cap 14).
#   S2: init-spill A/B at 20.97M 3D auto geometry (bench/ab_spill.py):
#       arm "raise" = whole-run capacity 12 (the r4 behavior, 175.6M),
#       arm "spill" = chooser capacity 11 with the deferral-style init
#       spill. One process, chunked, monitors checked.
#   S3: tuned 3D headline checker gate: --rebin3-every 2 flips the
#       geometry chooser to the zs=256 candidate (cap 11; the cadence A/B
#       measured 223.8M p-s/s there) — the config bench.py now ships for
#       3D (TUNED_CADENCE3).
#   S4: auto 3D checker gate re-run: the auto path now spills to cap 11
#       on [205,208,128]; replaces the cap-12 gate row (144.2M).
#   S5: bench.py end-to-end canary at 2.1M 3D (exercises the tuned-3D
#       wiring + fallback machinery on real hardware before the driver
#       runs bench.py at round end).
# Log: /tmp/r5_queue6.log
set -u
cd /root/repo
exec >>/tmp/r5_queue6.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
echo "=== r5_queue6 start $(stamp)"

ok=0
for i in $(seq 1 12); do
    if timeout 300 python -c "
import jax, numpy as np
x = jax.jit(lambda a: a*2)(np.ones(8, np.float32))
assert float(np.asarray(x)[0]) == 2.0
print('relay OK')
"; then ok=1; break; fi
    echo "probe $i failed $(stamp); sleeping 300s"; sleep 300
done
if [ "$ok" -ne 1 ]; then
    echo "=== r5_queue6 abort: relay never came back $(stamp)"
    exit 1
fi

echo "--- S1 2D LJ headline checker gate, attempt 4 $(stamp)"
timeout 10800 python -m ppsim_tpu -n 20971520 -s 42 --force-law lj \
    --dt 1e-4 --savefreq 100 --check --chunk-steps 200 \
    --metrics bench/results_checkgate.jsonl
echo "S1 exit=$? $(stamp)"

echo "--- S2 init-spill A/B at 20.97M 3D $(stamp)"
timeout 14400 python bench/ab_spill.py -n 20971520 --chunk-steps 200 \
    --repeats 3 --out bench/results_tpu3d.jsonl
echo "S2 exit=$? $(stamp)"

echo "--- S3 tuned 3D headline checker gate (rebin3_every=2) $(stamp)"
timeout 10800 python -m ppsim_tpu -n 20971520 --ndim 3 --density 7e-6 \
    --engine pallas3d -s 42 --rebin3-every 2 --savefreq 100 --check \
    --chunk-steps 200 --metrics bench/results_checkgate.jsonl
echo "S3 exit=$? $(stamp)"

echo "--- S4 auto 3D checker gate (spill path) $(stamp)"
timeout 10800 python -m ppsim_tpu -n 20971520 --ndim 3 --density 7e-6 \
    --engine pallas3d -s 42 --savefreq 100 --check --chunk-steps 200 \
    --metrics bench/results_checkgate.jsonl
echo "S4 exit=$? $(stamp)"

echo "--- S5 bench.py 3D canary at 2.1M (tuned wiring end-to-end) $(stamp)"
timeout 7200 python bench.py --ndim 3 -n 2097152 --steps 200 --repeats 2 \
    --chunk-steps 100
echo "S5 exit=$? $(stamp)"

echo "=== r5_queue6 done $(stamp)"
