#!/bin/bash
# Round-5 queue part 8: chains after r5_queue7.
#   S1: 3D sweep row at 20.97M — the auto config now init-spills to
#       capacity 11 (ab:init_spill measured 229.2M p-s/s); a fresh sweep
#       row replaces the old 175.6M point in bench/3d-linear.png
#       (plot.py keeps best seconds per size).
#   S2: 2D LJ sweep row at 20.97M (r4 verdict missing #3: the law x scale
#       matrix's last cell) — expect the 2D capacity self-heal to fire
#       (LJ outgrew cap 14 mid-run in r5 testing).
#   S3: regenerate the linear figures.
# Log: /tmp/r5_queue8.log
set -u
cd /root/repo
exec >>/tmp/r5_queue8.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
echo "=== r5_queue8 start $(stamp)"

for i in $(seq 1 720); do
    if grep -qE "=== r5_queue7 (done|abort)" /tmp/r5_queue7.log 2>/dev/null; then
        break
    fi
    sleep 60
done
echo "queue7 cleared at $(stamp)"

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
    echo "=== r5_queue8 abort: relay never came back $(stamp)"
    exit 1
fi

echo "--- S1 3D sweep row at 20.97M (spill-enabled auto) $(stamp)"
timeout 10800 python bench/sweep.py --engine pallas3d --ndim 3 \
    --density 7e-6 --sizes 20971520 --chunk-steps 200 --repeats 3 \
    --out bench/results_tpu3d.jsonl
echo "S1 exit=$? $(stamp)"

echo "--- S2 2D LJ sweep row at 20.97M $(stamp)"
timeout 10800 python bench/sweep.py --engine pallas \
    --force-law lj --dt 1e-4 --sizes 20971520 --chunk-steps 200 \
    --repeats 3 --out bench/results_tpu.jsonl
echo "S2 exit=$? $(stamp)"

echo "--- S3 regenerate linear figures $(stamp)"
timeout 600 python bench/plot.py bench/results_tpu3d.jsonl --prefix 3d-
timeout 600 python bench/plot.py bench/results_tpu.jsonl
echo "S3 exit=$? $(stamp)"

echo "=== r5_queue8 done $(stamp)"
