#!/bin/bash
# Round-4 queue part 4: validate the LJ auto-capacity floor + self-healing
# retry (the fix for the ab:lj_capacity auto-drop failed ablation).
# S0: small 3D TPU smoke (auto geometry end-to-end).
# S1: ab_ljcap auto variant only at 20.97M (hand control already recorded
#     at 135.0M p-s/s; the floor makes auto choose the same effective 13).
# S2: checker gate of the full stretch config with NO hand capacity flag
#     (the r3 gate needed --grid3-capacity 12; "Done" = PASS without it).
# Log: /tmp/r4_queue4.log
set -u
cd /root/repo
exec >>/tmp/r4_queue4.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
echo "=== r4_queue4 start $(stamp)"

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
    echo "=== r4_queue4 abort: relay never came back $(stamp)"
    exit 1
fi

echo "=== stage S0: 3D auto-geometry smoke $(stamp)"
timeout 2400 python -m ppsim_tpu -n 100000 --ndim 3 --density 7e-6 \
    --engine pallas3d -s 42 --force-law lj --dt 1e-4 \
    || { echo "S0 FAILED $(stamp)"; exit 1; }

echo "=== stage S1: LJ auto-floor A/B row, n=20.97M $(stamp)"
timeout 7200 python bench/ab_ljcap.py --only auto \
    --out bench/results_tpu3d.jsonl

echo "=== stage S2: stretch checker gate, auto capacity $(stamp)"
timeout 10800 python -m ppsim_tpu -n 20971520 --ndim 3 --density 7e-6 \
    --engine pallas3d -s 42 --force-law lj --dt 1e-4 --savefreq 100 \
    --check --chunk-steps 200 --metrics bench/results_checkgate.jsonl

echo "=== r4_queue4 done $(stamp)"
