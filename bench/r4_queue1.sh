#!/bin/bash
# Round-4 queue part 1 (staged evidence-queue discipline, CLAUDE.md):
#   S1  checker-gate the shipped cadence-11 headline config end-to-end
#   S2  single-device tile-engine regression A/B (tile 1x1 == strip ==
#       pallas; + forced-ghost-lane tax measurement)
# Log: /tmp/r4_queue1.log
set -u
cd /root/repo
exec >>/tmp/r4_queue1.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
echo "=== r4_queue1 start $(stamp)"

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
    echo "=== r4_queue1 abort: relay never came back $(stamp)"
    exit 1
fi

echo "=== stage S1: checker gate, cadence-11 headline $(stamp)"
timeout 5400 python -m ppsim_tpu -n 20971520 --engine pallas -s 42 \
    --rebin-every 11 --savefreq 100 --check --chunk-steps 200 \
    --metrics bench/results_checkgate.jsonl

echo "=== stage S2: single-device tile A/B $(stamp)"
timeout 7200 python bench/ab_tile1.py -n 4194304 --repeats 3 \
    --out bench/results_tpu.jsonl

echo "=== r4_queue1 done $(stamp)"
