#!/bin/bash
# Round-3 queue part 14: after the cadence A/Bs (queue12) drain —
#   P1. bench.py pre-flight with the flipped grid_snap_lanes default
#       (expect ~927M p-s/s at 20.97M, vs_baseline ~2.88).
#   P2+P3. sharded_tile CPU-mesh strong + weak scaling on the then-idle
#       host (replaces the stopped r3_queue13; same commands).
# Log: /tmp/r3_queue14.log
set -u
cd /root/repo
exec >>/tmp/r3_queue14.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
echo "=== r3_queue14 start $(stamp)"

Q12PID="$(cat /tmp/r3_queue12.script.pid 2>/dev/null || echo 27723)"
for i in $(seq 1 360); do
    kill -0 "$Q12PID" 2>/dev/null || break
    sleep 60
done
echo "=== queue12 finished or wait cap hit $(stamp)"

for i in $(seq 1 60); do
    if timeout 300 python -c "
import jax, numpy as np
x = jax.jit(lambda a: a*2)(np.ones(8, np.float32))
assert float(np.asarray(x)[0]) == 2.0
print('relay OK')
"; then break; fi
    echo "probe $i failed $(stamp); sleeping 600s"; sleep 600
done

echo "=== stage P1: bench.py pre-flight (snap default ON) $(stamp)"
timeout 7200 python bench.py

echo "=== stage P2: sharded_tile strong scaling (CPU mesh) $(stamp)"
timeout 14400 python bench/sweep.py --strong 262144 --steps 500 --repeats 3 \
    --cpu-mesh 8 --devices 1,2,4,8 --engine sharded_tile --col-block 8 \
    --out bench/results_cpu_mesh_r3.jsonl

echo "=== stage P3: sharded_tile weak scaling (CPU mesh) $(stamp)"
timeout 14400 python bench/sweep.py --weak 65536 --steps 500 --repeats 3 \
    --cpu-mesh 8 --devices 1,2,4,8 --engine sharded_tile --col-block 8 \
    --out bench/results_cpu_mesh_r3.jsonl

echo "=== r3_queue14 done $(stamp)"
