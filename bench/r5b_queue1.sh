#!/bin/bash
# Round-5b TPU queue (fresh host; the staged r5_queue6/7/8 never ran
# here). Consolidates the still-pending TPU evidence in value order:
#   S1: 2D LJ headline checker gate, attempt 5 — first attempt WITH the
#       harness warm-phase retry (the four identical failures were the
#       degraded compile-helper window on the pack compile; see CLAUDE.md).
#       Runs first: it is a correctness gate, not a timing row, so host
#       contention with the local CPU-mesh capture is acceptable.
#   (barrier): wait for the local 3D scaling capture to finish so the
#       timed stages below run on an idle host.
#   S2: re-run bench/ab_spill.py at 20.97M — BASELINE.md cites
#       "ab": "init_spill" rows (raise 119.43 s vs spill 91.51 s) that are
#       NOT in the committed results_tpu3d.jsonl (the r5 session that
#       measured them lost the append). Regenerate the rows in THIS
#       session so the evidence trail matches the doc.
#   S3: 3D sweep row at 20.97M — auto now init-spills to cap 11; replaces
#       the cap-12 175.6M point in bench/3d-linear.png.
#   S4: 2D LJ sweep row at 20.97M (law x scale matrix last cell, timing).
#   S5: small-n standard re-measure (r5 floor was 25.6 ms/exec; session
#       floors vary — a faster session may clear 1.0x P100 standard).
#   S6: optional bench.py refresh (the driver runs bench.py at round end
#       anyway).
# Log: /tmp/r5b_queue1.log
set -u
cd /root/repo
exec >>/tmp/r5b_queue1.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
echo "=== r5b_queue1 start $(stamp)"

ok=0
for i in $(seq 1 24); do
    if timeout 300 python -c "
import jax, numpy as np
x = jax.jit(lambda a: a*2)(np.ones(8, np.float32))
assert float(np.asarray(x)[0]) == 2.0
print('relay OK')
"; then ok=1; break; fi
    echo "probe $i failed $(stamp); sleeping 240s"; sleep 240
done
if [ "$ok" -ne 1 ]; then
    echo "=== r5b_queue1 abort: relay never came back $(stamp)"
    exit 1
fi
echo "relay up at $(stamp)"

echo "--- S1 2D LJ headline checker gate, attempt 5 (warm retry) $(stamp)"
timeout 10800 python -m ppsim_tpu -n 20971520 -s 42 --force-law lj \
    --dt 1e-4 --savefreq 100 --check --chunk-steps 200 \
    --metrics bench/results_checkgate.jsonl
echo "S1 exit=$? $(stamp)"

# Barrier: idle host for the timed stages (75 min cap).
for i in $(seq 1 75); do
    [ -f /tmp/r5b_local_done ] && break
    sleep 60
done
echo "local barrier cleared at $(stamp)"

echo "--- S2 init-spill A/B at 20.97M 3D (regenerate JSONL rows) $(stamp)"
timeout 14400 python bench/ab_spill.py -n 20971520 --chunk-steps 200 \
    --repeats 3 --out bench/results_tpu3d.jsonl
echo "S2 exit=$? $(stamp)"

echo "--- S3 3D sweep row at 20.97M (spill-enabled auto) $(stamp)"
timeout 10800 python bench/sweep.py --engine pallas3d --ndim 3 \
    --density 7e-6 --sizes 20971520 --chunk-steps 200 --repeats 3 \
    --out bench/results_tpu3d.jsonl
echo "S3 exit=$? $(stamp)"

echo "--- S4 2D LJ sweep row at 20.97M $(stamp)"
timeout 10800 python bench/sweep.py --engine pallas \
    --force-law lj --dt 1e-4 --sizes 20971520 --chunk-steps 200 \
    --repeats 3 --out bench/results_tpu.jsonl
echo "S4 exit=$? $(stamp)"

echo "--- S5 small-n standard re-measure $(stamp)"
timeout 7200 python bench/smalln.py --out bench/results_tpu.jsonl
echo "S5 exit=$? $(stamp)"

echo "--- S6 bench.py headline refresh $(stamp)"
timeout 10800 python bench.py
echo "S6 exit=$? $(stamp)"

echo "=== r5b_queue1 done $(stamp)"
