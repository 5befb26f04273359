#!/bin/bash
# Round-5 local (no-TPU) stage: 3D multi-device scaling rows on the
# 8-virtual-device CPU mesh (verdict r4 missing #2 — the 2D matrix in
# results_cpu_mesh_r3.jsonl has no 3D counterpart). Same protocol as the
# 2D tables: 500 steps, best-of-N in one isolated capture, impl="xla"
# (the CPU-mesh correctness/overhead vehicle — Mosaic kernels only run
# interpret-emulated off-TPU). Framed as SHARDING OVERHEAD: the host has
# one physical core, so wall-clock cannot speed up; T(P)/T(1) at fixed n
# is the signal (reference analog: part2 PDF p.4/p.6 strong/weak tables).
# MUST run on an idle host (the CPU is the measured device here).
# Log: /tmp/r5_local1.log
set -u
cd /root/repo
exec >>/tmp/r5_local1.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
echo "=== r5_local1 start $(stamp)"

echo "--- S1 strong scaling, n=131072 $(stamp)"
timeout 14400 python bench/sweep.py --strong 131072 --steps 500 \
    --repeats 2 --cpu-mesh 8 --devices 1,2,4,8 --engine sharded_grid3d \
    --impl xla --ndim 3 --density 7e-6 \
    --out bench/results_cpu_mesh_3d.jsonl
echo "S1 exit=$? $(stamp)"

echo "--- S2 weak scaling, 32768/device $(stamp)"
timeout 14400 python bench/sweep.py --weak 32768 --steps 500 \
    --repeats 2 --cpu-mesh 8 --devices 1,2,4,8 --engine sharded_grid3d \
    --impl xla --ndim 3 --density 7e-6 \
    --out bench/results_cpu_mesh_3d.jsonl
echo "S2 exit=$? $(stamp)"

echo "--- S3 figures $(stamp)"
timeout 600 python bench/plot.py bench/results_cpu_mesh_3d.jsonl \
    --prefix cpu-mesh-3d-
echo "S3 exit=$? $(stamp)"

echo "=== r5_local1 done $(stamp)"
