#!/bin/bash
# Round-3 queue part 8: exact-cover grid-geometry A/B.
# The fitted two-term cost model (bench/geom_fit.py; fit to the 11 recorded
# grid_geometry ablation rows, <=3% residual) predicts that EXACT-COVER
# geometries — bin scale chosen so the bin count lands exactly on a
# 128-lane multiple, capacity following occupancy (ceil(occ)+6, the rule
# both measured sweet spots obey) — beat the scale-5 default:
#   4.2M:  m=640  (scale 7.161, cap 17)  pred 1.036 ns/pstep vs 1.158 default
#          m=768  (scale 5.967, cap 14)  pred 1.075
#          m=896  (scale 5.114, cap 12)  pred 1.133
#   20.97M: m=1664 (scale 6.156, cap 14) pred 1.010 vs 1.030 default (2048)
#          m=1792 (scale 5.716, cap 13)  pred 1.036
#          m=1920 (scale 5.335, cap 12)  pred 1.042
# One process per size (in-session numbers are stable; cross-session ~2x).
# Waits for r3_queue7 (overlapped checkgate re-measures) to finish first.
# Log: /tmp/r3_queue8.log
set -u
cd /root/repo
exec >>/tmp/r3_queue8.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
echo "=== r3_queue8 start $(stamp)"

for i in $(seq 1 200); do
    grep -q "r3_queue7 done" /tmp/r3_queue7.log 2>/dev/null && break
    sleep 120
done
echo "=== queue7 finished or wait cap hit $(stamp)"

echo "=== stage I1: 4.2M exact-cover A/B $(stamp)"
timeout 7200 python bench/ab_grid.py -n 4194304 --repeats 3 \
    --variants 5:11:8,7.161:17:8,5.9667:14:8,5.1139:12:8 \
    --out bench/results_tpu.jsonl

echo "=== stage I2: 20.97M exact-cover A/B $(stamp)"
timeout 10800 python bench/ab_grid.py -n 20971520 --repeats 3 \
    --chunk-steps 200 \
    --variants 5:11:8,6.1557:14:8,5.7159:13:8,5.3347:12:8,6.6689:15:8 \
    --out bench/results_tpu.jsonl

echo "=== r3_queue8 done $(stamp)"
