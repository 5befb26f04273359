#!/bin/bash
# Round-4 queue part 2 (staged evidence-queue discipline, CLAUDE.md):
#   S1  small-n dispatch-floor attack (r3 verdict #4): measure the relay's
#       bare per-execution latency, then amortize K full runs into one
#       program at 1k/4k/16k/64k vs the P100 rows
#   S2  occupancy-frontier layout A/B (r3 verdict #6): slab planes vs the
#       sort/gather compact layout at n=4.2M, one process
#   S3  LJ capacity A/B at the 20.97M stretch scale (r3 verdict #5):
#       hand cap 12 (r3 row) vs the law-keyed auto choice, one process
# Log: /tmp/r4_queue2.log
set -u
cd /root/repo
exec >>/tmp/r4_queue2.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
echo "=== r4_queue2 start $(stamp)"

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
    echo "=== r4_queue2 abort: relay never came back $(stamp)"
    exit 1
fi

echo "=== stage S1: small-n floor + K-fused amortization $(stamp)"
timeout 5400 python bench/smalln.py --k 8 --repeats 3 \
    --out bench/results_tpu.jsonl

echo "=== stage S2: slab vs gather layout A/B, n=4.2M $(stamp)"
timeout 5400 python bench/ab_layout.py --repeats 3 \
    --out bench/results_tpu.jsonl

echo "=== stage S3: LJ capacity A/B, n=20.97M $(stamp)"
timeout 10800 python bench/ab_ljcap.py --repeats 3 \
    --out bench/results_tpu3d.jsonl

echo "=== r4_queue2 done $(stamp)"
