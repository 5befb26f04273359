#!/bin/bash
# Round-5b queue part 3: the timed TPU stages, hand-sequenced after (a)
# the claim-mode LJ gate process exits and (b) the local CPU-mesh capture
# releases the host — so every timed row runs one-TPU-client, idle-host.
# Stage starts are deadline-guarded (DEADLINE_EPOCH env, default +75 min)
# so nothing overlaps the driver's round-end bench.py.
#   S1: bench/ab_spill.py at 20.97M — regenerate the "ab": "init_spill"
#       JSONL rows BASELINE.md cites (the r5 session that measured them
#       lost the append). Rows also print per-arm to this log, so a
#       deadline kill mid-S1 still leaves recoverable evidence.
#   S2: 3D sweep row at 20.97M (spill-enabled auto; refreshes the
#       175.6M point in bench/3d-linear.png).
#   S3: 2D LJ sweep row at 20.97M (law x scale timing row).
# Log: /tmp/r5b_queue3.log
set -u
cd /root/repo
exec >>/tmp/r5b_queue3.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
DEADLINE=${DEADLINE_EPOCH:-$(( $(date +%s) + 4500 ))}
echo "=== r5b_queue3 start $(stamp) deadline=$DEADLINE"

for i in $(seq 1 120); do
    [ -f /tmp/r5b_gate_done ] && [ -f /tmp/r5b_local_done ] && break
    [ "$(date +%s)" -ge "$DEADLINE" ] && { echo "deadline in barrier $(stamp)"; exit 1; }
    sleep 60
done
echo "barrier cleared at $(stamp)"

left=$(( DEADLINE - $(date +%s) ))
if [ "$left" -gt 600 ]; then
    echo "--- S1 init-spill A/B at 20.97M $(stamp) (${left}s left)"
    timeout "$left" python bench/ab_spill.py -n 20971520 --chunk-steps 200 \
        --repeats 3 --out bench/results_tpu3d.jsonl
    echo "S1 exit=$? $(stamp)"
fi

left=$(( DEADLINE - $(date +%s) ))
if [ "$left" -gt 600 ]; then
    echo "--- S2 3D sweep row at 20.97M $(stamp) (${left}s left)"
    timeout "$left" python bench/sweep.py --engine pallas3d --ndim 3 \
        --density 7e-6 --sizes 20971520 --chunk-steps 200 --repeats 3 \
        --out bench/results_tpu3d.jsonl
    echo "S2 exit=$? $(stamp)"
fi

left=$(( DEADLINE - $(date +%s) ))
if [ "$left" -gt 600 ]; then
    echo "--- S3 2D LJ sweep row at 20.97M $(stamp) (${left}s left)"
    timeout "$left" python bench/sweep.py --engine pallas \
        --force-law lj --dt 1e-4 --sizes 20971520 --chunk-steps 200 \
        --repeats 3 --out bench/results_tpu.jsonl
    echo "S3 exit=$? $(stamp)"
fi

echo "=== r5b_queue3 done $(stamp)"
