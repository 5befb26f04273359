#!/bin/bash
# Round-5b local (no-TPU) stage: 3D multi-device scaling matrix on the
# 8-virtual-device CPU mesh (r4 verdict missing #2). The staged r5
# protocol (n=131072, 500 steps) measured 1417 s for the SINGLE P=1 row
# on this 1-core host — a full 1/2/4/8 strong+weak matrix at that
# protocol is ~4 h of wall clock, so this capture uses a reduced,
# self-consistent protocol: strong n=32768 / weak 8192-per-device, 200
# steps, repeats 2, all rows in one capture. The signal is unchanged —
# T(P)/T(1) sharding overhead on one physical core (reference analog:
# part2 PDF p.4/p.6 strong/weak tables; here wall-clock cannot speed up,
# the ratio IS the measurement). The old P=1 1417 s row stays in the
# JSONL as the protocol-sizing record.
# Log: /tmp/r5b_local1.log  Done-marker: /tmp/r5b_local_done
set -u
cd /root/repo
exec >>/tmp/r5b_local1.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
echo "=== r5b_local1 start $(stamp)"

echo "--- S1 strong scaling, n=32768, 200 steps $(stamp)"
timeout 7200 python bench/sweep.py --strong 32768 --steps 200 \
    --repeats 2 --cpu-mesh 8 --devices 1,2,4,8 --engine sharded_grid3d \
    --impl xla --ndim 3 --density 7e-6 \
    --out bench/results_cpu_mesh_3d.jsonl
echo "S1 exit=$? $(stamp)"

echo "--- S2 weak scaling, 8192/device, 200 steps $(stamp)"
timeout 7200 python bench/sweep.py --weak 8192 --steps 200 \
    --repeats 2 --cpu-mesh 8 --devices 1,2,4,8 --engine sharded_grid3d \
    --impl xla --ndim 3 --density 7e-6 \
    --out bench/results_cpu_mesh_3d.jsonl
echo "S2 exit=$? $(stamp)"

echo "--- S3 figures $(stamp)"
timeout 600 python bench/plot.py bench/results_cpu_mesh_3d.jsonl \
    --prefix cpu-mesh-3d-
echo "S3 exit=$? $(stamp)"

touch /tmp/r5b_local_done
echo "=== r5b_local1 done $(stamp)"
