#!/bin/bash
# Round-5b queue 3b (replaces r5b_queue3): after the claim-chunked LJ
# gate releases the TPU, regenerate the "ab": "init_spill" rows at
# 20.97M. Tries the SORT pack first (comparable to the r5 anchor rows:
# raise arm 119.43 s); if the degraded compile-helper window is still
# rejecting the 20M sorted-scatter temp, falls back to the compile-safe
# claim pack (recorded in the rows via grid_pack_mode). A 3D sweep row
# follows if the deadline allows. Hard deadline: no stage starts after
# DEADLINE_EPOCH and every stage is timeout-bound to it (the driver's
# round-end bench.py must find the TPU free).
# Log: /tmp/r5b_queue3b.log
set -u
cd /root/repo
exec >>/tmp/r5b_queue3b.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
DEADLINE=${DEADLINE_EPOCH:-$(( $(date +%s) + 3000 ))}
echo "=== r5b_queue3b start $(stamp) deadline=$DEADLINE"

for i in $(seq 1 120); do
    [ -f /tmp/r5b_gate_done ] && break
    [ "$(date +%s)" -ge "$DEADLINE" ] && { echo "deadline in barrier $(stamp)"; exit 1; }
    sleep 60
done
echo "gate barrier cleared at $(stamp)"

left=$(( DEADLINE - $(date +%s) ))
if [ "$left" -gt 600 ]; then
    echo "--- S1 init-spill A/B, sort pack $(stamp) (${left}s left)"
    timeout "$left" python bench/ab_spill.py -n 20971520 --chunk-steps 200 \
        --repeats 2 --out bench/results_tpu3d.jsonl
    rc=$?
    echo "S1 exit=$rc $(stamp)"
    left=$(( DEADLINE - $(date +%s) ))
    if [ "$rc" -ne 0 ] && [ "$left" -gt 600 ]; then
        echo "--- S1b init-spill A/B, claim fallback $(stamp) (${left}s left)"
        timeout "$left" python bench/ab_spill.py -n 20971520 \
            --chunk-steps 200 --repeats 2 --pack-mode claim \
            --out bench/results_tpu3d.jsonl
        echo "S1b exit=$? $(stamp)"
    fi
fi

left=$(( DEADLINE - $(date +%s) ))
if [ "$left" -gt 600 ]; then
    echo "--- S2 3D sweep row at 20.97M $(stamp) (${left}s left)"
    timeout "$left" python bench/sweep.py --engine pallas3d --ndim 3 \
        --density 7e-6 --sizes 20971520 --chunk-steps 200 --repeats 3 \
        --out bench/results_tpu3d.jsonl
    echo "S2 exit=$? $(stamp)"
fi

echo "=== r5b_queue3b done $(stamp)"
