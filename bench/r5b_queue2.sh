#!/bin/bash
# Round-5b queue part 2: long-interval retry of the 2D LJ headline gate.
# The degraded compile-helper window (21.5 GB pathological layout on the
# pack sort's f32[2,n,8] temporary) outlasts the harness's in-process
# 8x30s warm retry — r5 evidence says the window ends on tens-of-minutes
# scales and then every program compiles clean. So: retry the WHOLE gate
# at ~15 min intervals after r5b_queue1 finishes, bounded by an absolute
# deadline (DEADLINE_EPOCH env or +85 min) so nothing overlaps the
# driver's round-end bench.py run.
# Log: /tmp/r5b_queue2.log
set -u
cd /root/repo
exec >>/tmp/r5b_queue2.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
DEADLINE=${DEADLINE_EPOCH:-$(( $(date +%s) + 5100 ))}
echo "=== r5b_queue2 start $(stamp) deadline=$DEADLINE"

for i in $(seq 1 240); do
    grep -qE "=== r5b_queue1 (done|abort)" /tmp/r5b_queue1.log 2>/dev/null && break
    [ "$(date +%s)" -ge "$DEADLINE" ] && { echo "deadline before queue1 cleared $(stamp)"; exit 1; }
    sleep 60
done
echo "queue1 cleared at $(stamp)"

attempt=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    attempt=$((attempt + 1))
    left=$(( DEADLINE - $(date +%s) ))
    [ "$left" -lt 900 ] && { echo "only ${left}s left; stopping $(stamp)"; break; }
    echo "--- LJ gate attempt $attempt $(stamp) (${left}s to deadline)"
    if timeout "$left" python -m ppsim_tpu -n 20971520 -s 42 --force-law lj \
        --dt 1e-4 --savefreq 100 --check --chunk-steps 200 \
        --metrics bench/results_checkgate.jsonl; then
        echo "=== r5b_queue2 gate PASS at attempt $attempt $(stamp)"
        exit 0
    fi
    echo "attempt $attempt failed $(stamp); sleeping 600s"
    sleep 600
done
echo "=== r5b_queue2 done (no pass) $(stamp)"
