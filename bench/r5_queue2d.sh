#!/bin/bash
# Round-5 queue, 2D-only stages (S4a/S4b/S5 of r5_queue1.sh), split out so
# the TPU keeps working while the 3D repack OOM (S1 arm "on",
# RESOURCE_EXHAUSTED in attempt_repack at 20.97M — see /tmp/r5_queue1.log
# 05:09Z) is fixed. These stages never touch the repack path (2D has no
# grid3 capacity phases).
# Log: /tmp/r5_queue2d.log
set -u
cd /root/repo
exec >>/tmp/r5_queue2d.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
echo "=== r5_queue2d start $(stamp)"

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
    echo "=== r5_queue2d abort: relay never came back $(stamp)"
    exit 1
fi

echo "--- S4b 2D LJ headline timed row $(stamp)"
timeout 7200 python bench/sweep.py --engine pallas --sizes 20971520 \
    --force-law lj --dt 1e-4 --chunk-steps 200 --repeats 3 \
    --out bench/results_tpu.jsonl
echo "S4b exit=$? $(stamp)"

echo "--- S4a 2D LJ headline checker gate $(stamp)"
timeout 10800 python -m ppsim_tpu -n 20971520 -s 42 --force-law lj \
    --dt 1e-4 --savefreq 100 --check --chunk-steps 200 \
    --metrics bench/results_checkgate.jsonl
echo "S4a exit=$? $(stamp)"

echo "--- S5 small-n standard-path re-measure $(stamp)"
timeout 7200 python bench/smalln.py --out bench/results_tpu.jsonl
echo "S5 exit=$? $(stamp)"

echo "=== r5_queue2d done $(stamp)"
