#!/bin/bash
# Round-3 queue part 9: LAUNCH ONLY IF the exact-cover A/B (r3_queue8)
# confirms the snap chooser's picks. Records the snapped 2D table rows
# (the sizes whose default grids pad badly: 1M/4.2M/16.38M, plus the
# headline 20.97M where the chooser may move off the already-exact 2048^2
# grid only for a better exact cover), then pre-flights bench.py with
# whatever default the A/B decided.
# Log: /tmp/r3_queue9.log
set -u
cd /root/repo
exec >>/tmp/r3_queue9.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
echo "=== r3_queue9 start $(stamp)"

for i in $(seq 1 60); do
    if timeout 300 python -c "
import jax, numpy as np
x = jax.jit(lambda a: a*2)(np.ones(8, np.float32))
assert float(np.asarray(x)[0]) == 2.0
print('relay OK')
"; then break; fi
    echo "probe $i failed $(stamp); sleeping 600s"; sleep 600
done

echo "=== stage J1: snapped 2D size rows $(stamp)"
timeout 14400 python bench/sweep.py --engine pallas --grid-snap-lanes 1 \
    --sizes 1048576,4194304,16384000 --repeats 3 \
    --out bench/results_tpu.jsonl

echo "=== stage J2: snapped headline (chunked) $(stamp)"
timeout 10800 python bench/sweep.py --engine pallas --grid-snap-lanes 1 \
    --sizes 20971520 --repeats 3 --chunk-steps 200 \
    --out bench/results_tpu.jsonl

echo "=== stage J2b: checker gate on a snapped run (deferral pressure) $(stamp)"
timeout 10800 python -m ppsim_tpu -n 4194304 --engine pallas -s 42 \
    --grid-snap-lanes 1 --savefreq 100 --check --chunk-steps 100 \
    --metrics bench/results_checkgate.jsonl

echo "=== stage J3: bench.py pre-flight $(stamp)"
timeout 7200 python bench.py

echo "=== r3_queue9 done $(stamp)"
