#!/bin/bash
# Round-3 queue part 7: re-measure the checker-gated saved runs with the
# OVERLAPPED frame-pull driver (commit ee28da8 pipelines host pulls of
# frame k with device execution of segment k+1; every recorded checkgate
# row predates it, so the saved-run wall times in BASELINE.md are stale).
#   H1. 2D pallas 20.97M, savefreq 100, --check (old row: 146.66 s wall)
#   H2. 3D pallas3d 20.97M repulsive, savefreq 100, --check (old: 312.53 s)
#   H3. full bench.py pre-flight (the driver's BENCH program)
# Log: /tmp/r3_queue7.log
set -u
cd /root/repo
exec >>/tmp/r3_queue7.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
echo "=== r3_queue7 start $(stamp)"

for i in $(seq 1 60); do
    if timeout 300 python -c "
import jax, numpy as np
x = jax.jit(lambda a: a*2)(np.ones(8, np.float32))
assert float(np.asarray(x)[0]) == 2.0
print('relay OK')
"; then break; fi
    echo "probe $i failed $(stamp); sleeping 600s"; sleep 600
done

echo "=== stage H1: 2D 20.97M overlapped checkgate $(stamp)"
timeout 10800 python -m ppsim_tpu -n 20971520 --engine pallas -s 42 \
    --savefreq 100 --check --chunk-steps 200 \
    --metrics bench/results_checkgate.jsonl

echo "=== stage H2: 3D 20.97M overlapped checkgate $(stamp)"
timeout 14400 python -m ppsim_tpu -n 20971520 --ndim 3 --density 7e-6 \
    --engine pallas3d -s 42 --savefreq 100 --check --chunk-steps 200 \
    --grid3-capacity 11 --metrics bench/results_checkgate.jsonl

echo "=== stage H3: full bench.py pre-flight $(stamp)"
timeout 7200 python bench.py

echo "=== r3_queue7 done $(stamp)"
