#!/bin/bash
# Round-3 queue part 16: refresh the 2D Lennard-Jones plug-in row with the
# snapped-geometry default (the recorded 703M row predates grid_snap_lanes;
# the repulsive comparison row moved 850M -> 932M). Chained on queue15.
# Log: /tmp/r3_queue16.log
set -u
cd /root/repo
exec >>/tmp/r3_queue16.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
echo "=== r3_queue16 start $(stamp)"

Q15PID="$(cat /tmp/r3_queue15.pid 2>/dev/null || echo 29474)"
for i in $(seq 1 600); do
    kill -0 "$Q15PID" 2>/dev/null || break
    sleep 60
done
echo "=== queue15 finished or wait cap hit $(stamp)"

for i in $(seq 1 30); do
    if timeout 300 python -c "
import jax, numpy as np
x = jax.jit(lambda a: a*2)(np.ones(8, np.float32))
assert float(np.asarray(x)[0]) == 2.0
print('relay OK')
"; then break; fi
    echo "probe $i failed $(stamp); sleeping 600s"; sleep 600
done

echo "=== stage R1: snapped 2D LJ row at 4.2M $(stamp)"
timeout 10800 python bench/sweep.py --engine pallas --force-law lj \
    --dt 1e-4 --sizes 4194304 --repeats 3 --out bench/results_tpu.jsonl

echo "=== r3_queue16 done $(stamp)"
