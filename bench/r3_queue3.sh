#!/bin/bash
# Round-3 TPU evidence queue, part 3. Reruns what part 2 lost:
#   B'. checker-gated 3D Lennard-Jones 20.97M — part 2's attempt hit a
#       Mosaic VMEM compile OOM (135.8M > 128M physical: the in-kernel
#       max-speed plane's register pressure at capacity 13); the kernel
#       now falls back to an XLA-side speed reduction above cap 12
#   B2. the unsaved LJ 20.97M sweep row through the same fallback
#       (regenerability check for BASELINE's 155.54 s row)
#   D'. the 2D grid-geometry ablation with slack-safe cadences (part 2's
#       scale-4 variant legitimately tripped the stale-slack guard)
# Log: /tmp/r3_queue3.log
set -u
cd /root/repo
LOG=/tmp/r3_queue3.log
exec >>"$LOG" 2>&1

stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }

echo "=== r3_queue3 start $(stamp)"

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

echo "=== stage B': checker-gated 3D LJ 20.97M (configs[4]) $(stamp)"
timeout 10800 python -m ppsim_tpu -n 20971520 --ndim 3 --density 7e-6 \
    --engine pallas3d -s 42 --force-law lj --dt 1e-4 --savefreq 100 --check \
    --chunk-steps 200 --grid3-capacity 12 --metrics bench/results_checkgate.jsonl

echo "=== stage B2: unsaved LJ 20.97M sweep row (regenerability) $(stamp)"
timeout 10800 python bench/sweep.py --engine pallas3d --ndim 3 --density 7e-6 \
    --force-law lj --dt 1e-4 --sizes 20971520 --repeats 3 \
    --grid3-capacity 12 --chunk-steps 40 --out bench/results_tpu3d.jsonl

echo "=== stage D': 2D grid-geometry ablation, n=4.2M $(stamp)"
timeout 14400 python bench/ab_grid.py -n 4194304 --repeats 3 \
    --variants 4:9:6,3:7:4,6:14:8,5:11:10 \
    --out bench/results_tpu.jsonl

echo "=== r3_queue3 done $(stamp)"
