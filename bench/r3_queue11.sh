#!/bin/bash
# Round-3 queue part 11: validate the margin-guarded snap chooser, then
# record the snapped 2D table rows.
#   L1. 16.38M A/B: control 1811^2/cap11 vs the NEW guarded pick
#       1408^2/cap15 (scale 6.4305) — the only chooser pick without a
#       recorded measurement (1M/4.2M/20.97M picks all won in parts 8/10).
#   L2. snapped sweep rows at 1M + 4.2M, then 16.38M and 20.97M (chunked).
#   L3. checker gate on a snapped 4.2M saved run (deferral pressure).
# Log: /tmp/r3_queue11.log
set -u
cd /root/repo
exec >>/tmp/r3_queue11.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
echo "=== r3_queue11 start $(stamp)"

for i in $(seq 1 60); do
    if timeout 300 python -c "
import jax, numpy as np
x = jax.jit(lambda a: a*2)(np.ones(8, np.float32))
assert float(np.asarray(x)[0]) == 2.0
print('relay OK')
"; then break; fi
    echo "probe $i failed $(stamp); sleeping 600s"; sleep 600
done

echo "=== stage L1: 16.38M guarded-pick A/B $(stamp)"
timeout 10800 python bench/ab_grid.py -n 16384000 --repeats 3 \
    --chunk-steps 200 \
    --variants 5:11:8,6.4305:15:8 --out bench/results_tpu.jsonl

echo "=== stage L2a: snapped rows 1M + 4.2M $(stamp)"
timeout 10800 python bench/sweep.py --engine pallas --grid-snap-lanes 1 \
    --sizes 1048576,4194304 --repeats 3 \
    --out bench/results_tpu.jsonl

echo "=== stage L2b: snapped row 16.38M (chunked) $(stamp)"
timeout 10800 python bench/sweep.py --engine pallas --grid-snap-lanes 1 \
    --sizes 16384000 --repeats 3 --chunk-steps 200 \
    --out bench/results_tpu.jsonl

echo "=== stage L2c: snapped headline 20.97M (chunked) $(stamp)"
timeout 10800 python bench/sweep.py --engine pallas --grid-snap-lanes 1 \
    --sizes 20971520 --repeats 3 --chunk-steps 200 \
    --out bench/results_tpu.jsonl

echo "=== stage L3: checker gate on a snapped run $(stamp)"
timeout 10800 python -m ppsim_tpu -n 4194304 --engine pallas -s 42 \
    --grid-snap-lanes 1 --savefreq 100 --check --chunk-steps 100 \
    --metrics bench/results_checkgate.jsonl

echo "=== r3_queue11 done $(stamp)"
