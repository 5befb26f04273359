#!/bin/bash
# Round-5b: 2D LJ headline checker gate, attempt 6 — first attempt with
# --grid-pack-mode claim (the sort-free pack), which removes the ONLY
# n-element device sort from the gate path. Attempts 1-5 all died in the
# degraded compile-helper window on the pack sort's pathological layout
# (f32[2,n,8] tiled to 21.5 GB); today's window has outlasted the 8x30s
# in-process warm retry, so this stops betting on helper luck entirely.
# Expect the 2D capacity self-heal to fire mid-gate (LJ outgrew cap 14 in
# r5 testing): the gate re-runs once at the escalated capacity.
# Log: /tmp/r5b_gate.log  Done-marker: /tmp/r5b_gate_done
set -u
cd /root/repo
exec >>/tmp/r5b_gate.log 2>&1
stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
echo "=== r5b_gate_lj2d start $(stamp)"
timeout 6600 python -m ppsim_tpu -n 20971520 -s 42 --force-law lj \
    --dt 1e-4 --savefreq 100 --check --chunk-steps 200 \
    --grid-pack-mode claim \
    --metrics bench/results_checkgate.jsonl
echo "gate exit=$? $(stamp)"
touch /tmp/r5b_gate_done
echo "=== r5b_gate_lj2d done $(stamp)"
