#!/bin/bash
# Round-5 queue, 3D stages (S1..S3 of r5_queue1.sh), re-run after the repack
# OOM fix (attempt_repack split into a donating gather + pack with a
# dispatch fence; the fused program RESOURCE_EXHAUSTED'd at 20.97M — see
# /tmp/r5_queue1.log 05:09Z and ppsim_tpu/engines/grid3d.py).
# Waits for the 2D queue (r5_queue2d.sh) to finish first: one TPU client at
# a time (relay compile helper is serialized; concurrent big clients starve
# each other).
# Log: /tmp/r5_queue3d.log
set -u
cd /root/repo
exec >>/tmp/r5_queue3d.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
echo "=== r5_queue3d start $(stamp)"

# Wait (bounded, 8h) for the 2D queue to finish or abort.
for i in $(seq 1 480); do
    if grep -qE "=== r5_queue2d (done|abort)" /tmp/r5_queue2d.log 2>/dev/null; then
        break
    fi
    sleep 60
done
echo "2D queue cleared at $(stamp)"

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
    echo "=== r5_queue3d abort: relay never came back $(stamp)"
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

echo "=== r5_queue3d done $(stamp)"
