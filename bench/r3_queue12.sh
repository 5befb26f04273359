#!/bin/bash
# Round-3 queue part 12: rebin-cadence A/B on the SNAPPED geometries.
# The fitted ablation rows show cadence 12 beating cadence 8 at scale-6
# shapes (4.2M scale6/cap14: 1.073 vs 1.091 ns/pstep; 20.97M scale6/cap14:
# 1.176 vs 1.205) but the snapped winners were only ever measured at
# cadence 8. Slack feasibility at vmax=4: cad 12 drift 0.024 < slack
# 0.0258 (20.97M pick, scale 6.1557) / 0.0308 (4.2M pick, scale 7.161).
# Cadence 12 cannot chunk at nsteps=1000 (no multiple-of-12 divisor), so
# the 20.97M runs go unchunked (~23 s/run, under the ~1 min relay kill).
# Waits for r3_queue11 to exit first.
# Log: /tmp/r3_queue12.log
set -u
cd /root/repo
exec >>/tmp/r3_queue12.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
echo "=== r3_queue12 start $(stamp)"

for i in $(seq 1 360); do
    kill -0 "$(cat /tmp/r3_queue11.pid 2>/dev/null)" 2>/dev/null || break
    sleep 60
done
echo "=== queue11 finished or wait cap hit $(stamp)"

for i in $(seq 1 60); do
    if timeout 300 python -c "
import jax, numpy as np
x = jax.jit(lambda a: a*2)(np.ones(8, np.float32))
assert float(np.asarray(x)[0]) == 2.0
print('relay OK')
"; then break; fi
    echo "probe $i failed $(stamp); sleeping 600s"; sleep 600
done

echo "=== stage M1: 20.97M snapped-pick cadence A/B $(stamp)"
timeout 14400 python bench/ab_grid.py -n 20971520 --repeats 3 \
    --variants 6.1557:14:8,6.1557:14:10,6.1557:14:12 \
    --out bench/results_tpu.jsonl

echo "=== stage M2: 4.2M snapped-pick cadence A/B $(stamp)"
timeout 10800 python bench/ab_grid.py -n 4194304 --repeats 3 \
    --variants 7.161:17:8,7.161:17:12 --out bench/results_tpu.jsonl

echo "=== r3_queue12 done $(stamp)"
