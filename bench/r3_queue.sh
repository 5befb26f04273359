#!/bin/bash
# Round-3 TPU evidence queue. Waits for the relay to come back, then runs:
#   1. bench.py --quick smoke
#   2. checker-gated 20.97M runs (2D pallas, 3D pallas3d repulsive + LJ) —
#      the reference's every-number-is-checked discipline
#      (part1/job-serial:9-16) at the declared stretch scale
#   3. the 3D bin-scale ablation at n=4.2M (the reference documents its
#      failed ablations too: part3 PDF Table 2, part1 PDF p.6)
# Each published row is a committed command line (regenerability bar).
# Log: /tmp/r3_queue.log
set -u
cd /root/repo
LOG=/tmp/r3_queue.log
exec >>"$LOG" 2>&1

stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }

echo "=== r3_queue start $(stamp)"

# -- stage 0: wait for the relay (probe every 10 min, give up after ~10 h)
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

echo "=== stage 1: smoke $(stamp)"
timeout 3600 python bench.py --quick || { echo "SMOKE FAILED"; exit 1; }

echo "=== stage 1b: 2D rebin A/B (dirs9 vs axes), one process $(stamp)"
timeout 7200 python bench/ab_rebin.py -n 20971520 --repeats 3 \
    --out bench/results_tpu.jsonl

echo "=== stage 2a: checker-gated 2D 20.97M $(stamp)"
timeout 10800 python -m ppsim_tpu -n 20971520 --engine pallas -s 42 \
    --savefreq 100 --check --chunk-steps 200 \
    --metrics bench/results_checkgate.jsonl

echo "=== stage 2b: checker-gated 3D repulsive 20.97M $(stamp)"
timeout 10800 python -m ppsim_tpu -n 20971520 --ndim 3 --density 7e-6 \
    --engine pallas3d -s 42 --savefreq 100 --check --chunk-steps 200 \
    --grid3-capacity 11 --metrics bench/results_checkgate.jsonl

echo "=== stage 2c: checker-gated 3D Lennard-Jones 20.97M (configs[4]) $(stamp)"
timeout 10800 python -m ppsim_tpu -n 20971520 --ndim 3 --density 7e-6 \
    --engine pallas3d -s 42 --force-law lj --dt 1e-4 --savefreq 100 --check \
    --chunk-steps 200 --grid3-capacity 12 --metrics bench/results_checkgate.jsonl

echo "=== stage 3a: 3D bin-scale ablation, scale 2 $(stamp)"
timeout 10800 python bench/sweep.py --engine pallas3d --ndim 3 --density 7e-6 \
    --sizes 4194304 --repeats 3 --grid3-bin-scale 2.0 --grid3-capacity 9 \
    --out bench/results_tpu3d.jsonl

echo "=== stage 3b: 3D bin-scale ablation, scale 4 $(stamp)"
timeout 10800 python bench/sweep.py --engine pallas3d --ndim 3 --density 7e-6 \
    --sizes 4194304 --repeats 3 --grid3-bin-scale 4.0 --grid3-capacity 27 \
    --out bench/results_tpu3d.jsonl

echo "=== r3_queue done $(stamp)"
