#!/bin/bash
# Round-3 queue part 17: relay came back? Then (a) bench.py --quick smoke to
# protect the driver's end-of-round headline run, (b) one-process cadence
# probe at the 2D headline: cadence 11 vs the shipped 10 (drift margin at 10
# was 0.0182 vs slack 0.0258; 12 tripped the deferral monitor — 11 is the
# untested midpoint worth ~1%).
# Log: /tmp/r3_queue17.log
set -u
cd /root/repo
exec >>/tmp/r3_queue17.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
echo "=== r3_queue17 start $(stamp)"

ok=0
for i in $(seq 1 30); do
    if timeout 300 python -c "
import jax, numpy as np
x = jax.jit(lambda a: a*2)(np.ones(8, np.float32))
assert float(np.asarray(x)[0]) == 2.0
print('relay OK')
"; then ok=1; break; fi
    echo "probe $i failed $(stamp); sleeping 300s"; sleep 300
done
if [ "$ok" -ne 1 ]; then
    # Don't burn the queue stages against a known-dead relay (r3 advisor):
    # bench.py's own preflight would spend another ~20 min before each
    # stage's timeout absorbed the hang.
    echo "=== r3_queue17 abort: relay never came back $(stamp)"
    exit 1
fi

echo "=== stage S1: bench.py --quick smoke $(stamp)"
timeout 3600 python bench.py --quick

echo "=== stage S2: headline cadence 11 A/B $(stamp)"
# 6.1557:14 is the snap chooser's recorded 20.97M pick (1664^2 exact cover);
# ab_grid runs snap-off so the triple pins that exact geometry.
timeout 7200 python bench/ab_grid.py -n 20971520 --repeats 3 \
    --variants 6.1557:14:10,6.1557:14:11 --out bench/results_tpu.jsonl

echo "=== r3_queue17 done $(stamp)"
