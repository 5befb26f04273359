#!/bin/bash
# Round-5 queue part 4: chains after r5_queue3d2.sh.
#   S1: small-n re-measure with the NEW fused-single-run column
#       (bench/smalln.py r5: pack + steps + final scalar in ONE program =
#       the standard contract at one relay round trip).
# Log: /tmp/r5_queue4.log
set -u
cd /root/repo
exec >>/tmp/r5_queue4.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
echo "=== r5_queue4 start $(stamp)"

for i in $(seq 1 600); do
    if grep -qE "=== r5_queue3d2 (done|abort)" /tmp/r5_queue3d2.log 2>/dev/null; then
        break
    fi
    sleep 60
done
echo "3D queue cleared at $(stamp)"

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
    echo "=== r5_queue4 abort: relay never came back $(stamp)"
    exit 1
fi

echo "--- S1 small-n re-measure (fused single-run column) $(stamp)"
timeout 7200 python bench/smalln.py --out bench/results_tpu.jsonl
echo "S1 exit=$? $(stamp)"

echo "=== r5_queue4 done $(stamp)"
