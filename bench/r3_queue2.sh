#!/bin/bash
# Round-3 TPU evidence queue, part 2. Waits for r3_queue.sh to finish,
# then runs the two stages it lost and the axes-default follow-ups:
#   A0. small saved+chunked smoke of the segment driver (new code path)
#   A.  checker-gated 2D 20.97M (r3_queue stage 2a OOMed HBM: in-program
#       frame capture; now runs unsaved segment programs + host frames)
#   B.  checker-gated 3D Lennard-Jones 20.97M (r3_queue stage 2c died on
#       the --dt/--dtype argparse prefix collision; --dt now exists)
#   C.  2D sweep refresh at the big sizes with the new axes-rebin default
#       (regenerable BASELINE rows for the flagship path)
#   D.  2D grid-geometry ablation (bin scale / capacity / cadence) —
#       the reference documents its bin-size ablations too (part1 PDF
#       p.6, part3 PDF Table 2)
# Log: /tmp/r3_queue2.log
set -u
cd /root/repo
LOG=/tmp/r3_queue2.log
exec >>"$LOG" 2>&1

stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }

echo "=== r3_queue2 start $(stamp)"

# -- stage -1: wait for queue part 1 to release the TPU
while [ -f /tmp/r3_queue.pid ] && kill -0 "$(cat /tmp/r3_queue.pid)" 2>/dev/null; do
    sleep 60
done
echo "=== part-1 queue done $(stamp)"

# -- stage 0: relay probe (10-min retry, ~10 h budget)
for i in $(seq 1 60); do
    if timeout 300 python -c "
import jax, numpy as np
x = jax.jit(lambda a: a*2)(np.ones(8, np.float32))
assert float(np.asarray(x)[0]) == 2.0
print('relay OK')
"; then
        break
    fi
    echo "probe $i failed $(stamp); sleeping 600s"
    sleep 600
done

echo "=== stage A0: segment-driver saved smoke, 1M $(stamp)"
timeout 3600 python -m ppsim_tpu -n 1048576 --engine pallas -s 42 \
    --savefreq 100 --check --chunk-steps 64 \
    --metrics bench/results_checkgate.jsonl || { echo "A0 FAILED"; exit 1; }

echo "=== stage A: checker-gated 2D 20.97M $(stamp)"
timeout 10800 python -m ppsim_tpu -n 20971520 --engine pallas -s 42 \
    --savefreq 100 --check --chunk-steps 200 \
    --metrics bench/results_checkgate.jsonl

echo "=== stage B: checker-gated 3D Lennard-Jones 20.97M (configs[4]) $(stamp)"
timeout 10800 python -m ppsim_tpu -n 20971520 --ndim 3 --density 7e-6 \
    --engine pallas3d -s 42 --force-law lj --dt 1e-4 --savefreq 100 --check \
    --chunk-steps 200 --grid3-capacity 12 --metrics bench/results_checkgate.jsonl

echo "=== stage C: 2D sweep refresh (axes default) $(stamp)"
timeout 10800 python bench/sweep.py --engine pallas \
    --sizes 4194304,16384000,20971520 --repeats 3 \
    --out bench/results_tpu.jsonl

echo "=== stage D: 2D grid-geometry ablation, n=4.2M $(stamp)"
timeout 14400 python bench/ab_grid.py -n 4194304 --repeats 3 \
    --out bench/results_tpu.jsonl

echo "=== r3_queue2 done $(stamp)"
