#!/bin/bash
# Round-3 queue part 15: close the evidence chain after queue14.
#   Q1. checker-gate the EXACT bench.py headline config: 20.97M, snapped
#       geometry (default), rebin cadence 10, saved frames, --check.
#       chunk 200 is a multiple of lcm(savefreq=100, rebin=10).
#   Q2. regenerate the three reference figures from the recorded JSONL.
#   Q3. full fast test suite (final green gate for the round).
# Log: /tmp/r3_queue15.log
set -u
cd /root/repo
exec >>/tmp/r3_queue15.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
echo "=== r3_queue15 start $(stamp)"

Q14PID="$(cat /tmp/r3_queue14.pid 2>/dev/null || echo 28327)"
for i in $(seq 1 480); do
    kill -0 "$Q14PID" 2>/dev/null || break
    sleep 60
done
echo "=== queue14 finished or wait cap hit $(stamp)"

for i in $(seq 1 30); do
    if timeout 300 python -c "
import jax, numpy as np
x = jax.jit(lambda a: a*2)(np.ones(8, np.float32))
assert float(np.asarray(x)[0]) == 2.0
print('relay OK')
"; then break; fi
    echo "probe $i failed $(stamp); sleeping 600s"; sleep 600
done

echo "=== stage Q1: checker gate on the exact headline config $(stamp)"
timeout 14400 python -m ppsim_tpu -n 20971520 --engine pallas -s 42 \
    --rebin-every 10 --savefreq 100 --check --chunk-steps 200 \
    --metrics bench/results_checkgate.jsonl

echo "=== stage Q2: regenerate figures $(stamp)"
timeout 3600 python bench/plot.py

echo "=== stage Q3: full fast test suite $(stamp)"
timeout 7200 python -m pytest tests/ -q -m "not slow" 2>&1 | tail -5

echo "=== r3_queue15 done $(stamp)"
