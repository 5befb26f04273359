#!/bin/bash
# Round-5 queue part 1b: continuation of r5_queue1.sh after the host-side
# driver died mid-S1 (the queue's parent session ended; stage S0 smoke had
# already PASSED at 01:38Z — 453.2M p-s/s at 262k, monitors clean, see
# /tmp/r5_queue1.log). Identical stages S1..S5, re-run from the top of S1.
# Launch DETACHED (setsid) so session churn can't kill it again.
# Log: /tmp/r5_queue1.log (appended)
set -u
cd /root/repo
exec >>/tmp/r5_queue1.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
echo "=== r5_queue1b start $(stamp)"

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
    echo "=== r5_queue1b abort: relay never came back $(stamp)"
    exit 1
fi

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

echo "=== r5_queue1b done $(stamp)"
