#!/bin/bash
# Round-4 queue part 5: the 3D rebin-cadence A/B the 2D family already has
# (BASELINE "Rebin cadence on the snapped geometries"). At the 3D headline
# (n=20.97M, density 7e-6, repulsive) the auto cadence is 2 — the measured
# speed tail (5.21 at 4.2M, grid3d_ops._VMAX_TAIL note) caps it, unlike the
# 2D family's 11. One process, three arms:
#   cadence 1  — per-step rebin: quantifies the rebin share the lazy
#                cadence actually buys (vecmp t1..t4 analog, measured);
#   cadence 2  — the shipped auto choice (control);
#   cadence 4  — the frontier probe: predicted to trip the post-run
#                stale-slack check (drift 4*v*dt ~ 0.0104 vs slack 0.0053
#                on its own chooser geometry at v=5.2) — recording the
#                trip is the point (failed-ablation discipline).
# chunk 40 divides 1000 and is a multiple of every arm's cadence.
# Log: /tmp/r4_queue5.log
set -u
cd /root/repo
exec >>/tmp/r4_queue5.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
echo "=== r4_queue5 start $(stamp)"

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
    echo "=== r4_queue5 abort: relay never came back $(stamp)"
    exit 1
fi

echo "--- S1 3D cadence A/B 1,2,4 at 20.97M $(stamp)"
timeout 5400 python bench/ab_cadence.py -n 20971520 --ndim 3 --density 7e-6 \
    --engine pallas3d --cadences 1,2,4 --chunk-steps 40 --repeats 2 \
    --out bench/results_tpu3d.jsonl
echo "S1 exit=$? $(stamp)"
echo "=== r4_queue5 done $(stamp)"
