#!/bin/bash
# Round-5 queue, 3D stages, take 3 (after the graceful-fail repack redesign:
# attempt_repack returns the original carry on overflow — the step-40
# position pack overflowed even capacity 12 at 20.97M, killing take 2's
# fallback assert; see /tmp/r5_queue3d.log 06:00Z).
#   S0: repack-demand curve at 20.97M (NEW bench/repack_demand.py): the
#       instantaneous by-position max bin demand per 40-step chunk — decides
#       whether a cap-11 pack can EVER fit (the repack's premise) and when.
#   S1: capacity-repack A/B off/on (with the widened 480-step window).
#       If S0 shows demand never <= 11, the "on" arm records switch=null and
#       identical throughput — the measured failed ablation.
#   S2: 3D rebin-cadence A/B 1/2/4.
#   S3: 3D repulsive checker gate.
#   S4: 2D LJ headline checker gate — now self-heals (engines/grid.py r5):
#       records the measured 2D LJ run demand via the escalated capacity.
# Log: /tmp/r5_queue3d2.log
set -u
cd /root/repo
exec >>/tmp/r5_queue3d2.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
echo "=== r5_queue3d2 start $(stamp)"

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
    echo "=== r5_queue3d2 abort: relay never came back $(stamp)"
    exit 1
fi

echo "--- S0 repack-demand curve at 20.97M $(stamp)"
timeout 7200 python bench/repack_demand.py -n 20971520 \
    --out bench/results_tpu3d.jsonl
echo "S0 exit=$? $(stamp)"

echo "--- S1 capacity-repack A/B off/on at 20.97M 3D $(stamp)"
timeout 10800 python bench/ab_repack.py -n 20971520 --chunk-steps 200 \
    --repeats 3 --out bench/results_tpu3d.jsonl
echo "S1 exit=$? $(stamp)"

echo "--- S2 3D cadence A/B 1,2,4 at 20.97M $(stamp)"
timeout 10800 python bench/ab_cadence.py -n 20971520 --ndim 3 \
    --density 7e-6 --engine pallas3d --cadences 1,2,4 --chunk-steps 40 \
    --repeats 2 --out bench/results_tpu3d.jsonl
echo "S2 exit=$? $(stamp)"

echo "--- S3 3D repulsive checker gate $(stamp)"
timeout 10800 python -m ppsim_tpu -n 20971520 --ndim 3 --density 7e-6 \
    --engine pallas3d -s 42 --savefreq 100 --check --chunk-steps 200 \
    --metrics bench/results_checkgate.jsonl
echo "S3 exit=$? $(stamp)"

echo "--- S4 2D LJ headline checker gate (self-healing) $(stamp)"
timeout 10800 python -m ppsim_tpu -n 20971520 -s 42 --force-law lj \
    --dt 1e-4 --savefreq 100 --check --chunk-steps 200 \
    --metrics bench/results_checkgate.jsonl
echo "S4 exit=$? $(stamp)"

echo "=== r5_queue3d2 done $(stamp)"
