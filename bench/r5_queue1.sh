#!/bin/bash
# Round-5 queue part 1: the r4 verdict's evidence items, staged (smoke ->
# headline A/B -> gates -> ablations), each stage timeout-bounded.
#   S0: quick 2D smoke (warms the relay; catches outages cheaply).
#   S1: capacity-repack A/B at the 3D stretch scale (verdict #1): repack
#       off (the r4 175.6M behavior) vs on (prologue at pack capacity 12,
#       verified repack to run capacity 11). Target >=10% on the "on" arm.
#   S2: 3D rebin-cadence A/B 1/2/4 at 20.97M (verdict #2; the r4 queue5
#       probe that never ran). Cadence 4 is predicted to trip the post-run
#       stale-slack check — recording the trip is the point.
#   S3: 3D repulsive 20.97M checker gate with the repack (now the default
#       for repulsive) on the SAVED driver — verdict #1's "checker-gated".
#   S4: 2D LJ headline cell (verdict #5): checker gate + timed sweep row.
#   S5: small-n standard path re-measure (verdict #3: the init_carry
#       overflow sync now rides the monitors; expect ~1 fewer round trip).
# Log: /tmp/r5_queue1.log
set -u
cd /root/repo
exec >>/tmp/r5_queue1.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
echo "=== r5_queue1 start $(stamp)"

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
    echo "=== r5_queue1 abort: relay never came back $(stamp)"
    exit 1
fi

echo "--- S0 quick smoke $(stamp)"
timeout 2400 python bench.py --quick \
    || { echo "S0 FAILED $(stamp)"; exit 1; }

echo "--- S1 capacity-repack A/B off/on at 20.97M 3D $(stamp)"
timeout 10800 python bench/ab_repack.py -n 20971520 --chunk-steps 200 \
    --repeats 3 --out bench/results_tpu3d.jsonl
echo "S1 exit=$? $(stamp)"

echo "--- S2 3D cadence A/B 1,2,4 at 20.97M $(stamp)"
timeout 10800 python bench/ab_cadence.py -n 20971520 --ndim 3 \
    --density 7e-6 --engine pallas3d --cadences 1,2,4 --chunk-steps 40 \
    --repeats 2 --out bench/results_tpu3d.jsonl
echo "S2 exit=$? $(stamp)"

echo "--- S3 3D repulsive checker gate (repack default) $(stamp)"
timeout 10800 python -m ppsim_tpu -n 20971520 --ndim 3 --density 7e-6 \
    --engine pallas3d -s 42 --savefreq 100 --check --chunk-steps 200 \
    --metrics bench/results_checkgate.jsonl
echo "S3 exit=$? $(stamp)"

echo "--- S4a 2D LJ headline checker gate $(stamp)"
timeout 10800 python -m ppsim_tpu -n 20971520 -s 42 --force-law lj \
    --dt 1e-4 --savefreq 100 --check --chunk-steps 200 \
    --metrics bench/results_checkgate.jsonl
echo "S4a exit=$? $(stamp)"

echo "--- S4b 2D LJ headline timed row $(stamp)"
timeout 7200 python bench/sweep.py --engine pallas --sizes 20971520 \
    --force-law lj --dt 1e-4 --chunk-steps 200 --repeats 3 \
    --out bench/results_tpu.jsonl
echo "S4b exit=$? $(stamp)"

echo "--- S5 small-n standard-path re-measure $(stamp)"
timeout 7200 python bench/smalln.py --out bench/results_tpu.jsonl
echo "S5 exit=$? $(stamp)"

echo "=== r5_queue1 done $(stamp)"
