#!/bin/bash
# Round-3 queue part 5: refresh the sub-1M 2D sweep rows with the
# axes-rebin default (the big-3 rows were refreshed in part 2 stage C),
# so the whole BASELINE table is one session + one default.
set -u
cd /root/repo
exec >>/tmp/r3_queue5.log 2>&1
echo "=== r3_queue5 start $(date -u '+%FT%TZ')"
timeout 7200 python bench/sweep.py --engine pallas \
    --sizes 1000,4000,16000,64000,256000,1024000 --repeats 3 \
    --out bench/results_tpu.jsonl
echo "=== r3_queue5 done $(date -u '+%FT%TZ')"
