#!/bin/bash
# Round-5 queue part 7: chains after r5_queue6.
#   S1: 2D LJ headline checker gate, attempt 5 — FIRST attempt with the
#       harness warm-phase retry (harness._warm_with_retry): the four
#       identical failures were the degraded compile-helper lottery on the
#       pack compile (async, surfacing at the first segment call); the
#       warm phase now re-rolls up to 8x in-process with 30 s pauses.
#   S2: full headline bench.py (2D 20.97M) — refresh the headline number
#       in this session with the final r5 code before the driver's
#       round-end run.
# Log: /tmp/r5_queue7.log
set -u
cd /root/repo
exec >>/tmp/r5_queue7.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
echo "=== r5_queue7 start $(stamp)"

for i in $(seq 1 720); do
    if grep -qE "=== r5_queue6 (done|abort)" /tmp/r5_queue6.log 2>/dev/null; then
        break
    fi
    sleep 60
done
echo "queue6 cleared at $(stamp)"

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
    echo "=== r5_queue7 abort: relay never came back $(stamp)"
    exit 1
fi

echo "--- S1 2D LJ headline checker gate, attempt 5 (warm retry) $(stamp)"
timeout 14400 python -m ppsim_tpu -n 20971520 -s 42 --force-law lj \
    --dt 1e-4 --savefreq 100 --check --chunk-steps 200 \
    --metrics bench/results_checkgate.jsonl
echo "S1 exit=$? $(stamp)"

echo "--- S2 headline bench.py refresh $(stamp)"
timeout 10800 python bench.py
echo "S2 exit=$? $(stamp)"

echo "=== r5_queue7 done $(stamp)"
