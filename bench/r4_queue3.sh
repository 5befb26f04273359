#!/bin/bash
# Round-4 queue part 3: retry of the occupancy-frontier layout A/B.
# The 4.2M attempt crashed the relay worker on the gather variant (the
# compact-bin gather materializes ~21M padded bins at that size — HBM
# pressure + long executions). Retry at n=1M with 5-step gather chunks,
# slab control in the same process. Waits for r4_queue2 to finish first
# (one TPU job at a time).
# Log: /tmp/r4_queue3.log
set -u
cd /root/repo
exec >>/tmp/r4_queue3.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
echo "=== r4_queue3 start $(stamp)"

for i in $(seq 1 48); do
    if grep -qE 'r4_queue2 (done|abort)' /tmp/r4_queue2.log 2>/dev/null; then
        break
    fi
    sleep 300
done
if ! grep -qE 'r4_queue2 (done|abort)' /tmp/r4_queue2.log 2>/dev/null; then
    echo "=== r4_queue3 abort: queue2 never finished $(stamp)"
    exit 1
fi

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
    echo "=== r4_queue3 abort: relay never came back $(stamp)"
    exit 1
fi

echo "=== stage S1: slab vs gather layout A/B, n=1M $(stamp)"
timeout 5400 python bench/ab_layout.py -n 1048576 --slab-steps 1000 \
    --gather-steps 100 --gather-chunk 5 --repeats 3 \
    --out bench/results_tpu.jsonl

echo "=== r4_queue3 done $(stamp)"
