#!/bin/bash
# Round-3 queue part 10: measure the snap chooser's remaining picks so the
# default flip rests on data at every recorded 2D size (the 4.2M pick
# m=640 and the 20.97M candidates were A/B'd in part 8 / the follow-up):
#   K1. 1M:     control 458^2/cap11 vs pick 384^2/cap14 (scale 5.971)
#   K2. 16.38M: control 1811^2/cap11 vs pick 1280^2/cap16 (scale 7.0777)
# One process per size. Waits for the in-flight 20.97M A/B first.
# Log: /tmp/r3_queue10.log
set -u
cd /root/repo
exec >>/tmp/r3_queue10.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
echo "=== r3_queue10 start $(stamp)"

for i in $(seq 1 120); do
    kill -0 "$(cat /tmp/ab1536.pid 2>/dev/null)" 2>/dev/null || break
    sleep 60
done

echo "=== stage K1: 1M snap-pick A/B $(stamp)"
timeout 7200 python bench/ab_grid.py -n 1048576 --repeats 3 \
    --variants 5:11:8,5.971:14:8 --out bench/results_tpu.jsonl

echo "=== stage K2: 16.38M snap-pick A/B $(stamp)"
timeout 10800 python bench/ab_grid.py -n 16384000 --repeats 3 \
    --chunk-steps 200 \
    --variants 5:11:8,7.0739:16:8 --out bench/results_tpu.jsonl

echo "=== r3_queue10 done $(stamp)"
