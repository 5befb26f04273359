#!/bin/bash
# Round-3 queue part 6: re-measure the 3D tables with the CURRENT kernels
# (every recorded 3D row predates the in-kernel max-speed plane and the
# monitor unification), then pre-flight the headline bench.py program.
#   G1a. 3D repulsive 1M / 4.2M / 16.8M (default capacity)
#   G1b. 3D repulsive 20.97M (lattice packs to 12 -> --grid3-capacity 11)
#   G2.  3D LJ 1M / 4.2M (dt 1e-4; the 20.97M LJ row was re-measured in
#        part 3 stage B2: 155.35s through the VMEM fallback)
#   G3.  full bench.py (the driver's BENCH program, axes default)
# Log: /tmp/r3_queue6.log
set -u
cd /root/repo
exec >>/tmp/r3_queue6.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
echo "=== r3_queue6 start $(stamp)"

for i in $(seq 1 60); do
    if timeout 300 python -c "
import jax, numpy as np
x = jax.jit(lambda a: a*2)(np.ones(8, np.float32))
assert float(np.asarray(x)[0]) == 2.0
print('relay OK')
"; then break; fi
    echo "probe $i failed $(stamp); sleeping 600s"; sleep 600
done

echo "=== stage G1a: 3D repulsive sweep, current kernels $(stamp)"
timeout 14400 python bench/sweep.py --engine pallas3d --ndim 3 --density 7e-6 \
    --sizes 1000000,4194304,16777216 --repeats 3 --chunk-steps 100 \
    --out bench/results_tpu3d.jsonl

echo "=== stage G1b: 3D repulsive 20.97M $(stamp)"
timeout 14400 python bench/sweep.py --engine pallas3d --ndim 3 --density 7e-6 \
    --sizes 20971520 --repeats 3 --grid3-capacity 11 --chunk-steps 100 \
    --out bench/results_tpu3d.jsonl

echo "=== stage G2: 3D LJ 1M / 4.2M $(stamp)"
timeout 14400 python bench/sweep.py --engine pallas3d --ndim 3 --density 7e-6 \
    --force-law lj --dt 1e-4 --sizes 1000000,4194304 --repeats 3 \
    --chunk-steps 100 --out bench/results_tpu3d.jsonl

echo "=== stage G3: full bench.py pre-flight $(stamp)"
timeout 7200 python bench.py

echo "=== r3_queue6 done $(stamp)"
