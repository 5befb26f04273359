#!/bin/bash
# Round-3 TPU evidence queue, part 4: chase the bin-scale win.
# Part 3's 2D geometry ablation at n=4.2M found scale 6 / cap 14 runs
# 7.4% FASTER than the scale-5 default (913M vs 850M p-s/s) — bigger
# bins raise useful-lane occupancy ((occ/cap)^2: 26% vs 21%) and cut
# per-block fixed overheads, outweighing the extra pair planes.
#   E1. widen the probe at 4.2M: scale 6 with longer cadence, scale 7/8
#   E2. confirm the winner against the default at the 20.97M headline
# Log: /tmp/r3_queue4.log
set -u
cd /root/repo
LOG=/tmp/r3_queue4.log
exec >>"$LOG" 2>&1

stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }

echo "=== r3_queue4 start $(stamp)"

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

echo "=== stage E1: 2D geometry probe round 2, n=4.2M $(stamp)"
timeout 14400 python bench/ab_grid.py -n 4194304 --repeats 3 \
    --variants 6:14:12,7:18:10,8:22:12 \
    --out bench/results_tpu.jsonl

echo "=== stage E2: confirm at the 20.97M headline $(stamp)"
timeout 14400 python bench/ab_grid.py -n 20971520 --repeats 3 \
    --variants 5:11:8,6:14:8,6:14:12 \
    --out bench/results_tpu.jsonl

echo "=== r3_queue4 done $(stamp)"
