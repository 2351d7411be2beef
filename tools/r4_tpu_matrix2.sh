#!/bin/bash
# r4 TPU matrix, part 2: the runs behind experiments/results/r4/
#   ab_nmsfixed_*      — fixed-trip blocked NMS vs fori (the fault-safe
#                        fast path; VERDICT r3 #1)
#   ab_train_*         — train-step A/B matrix, rerun of the r3 logs
#                        that died in HBM OOM / header-only (#7)
#   microbench_pallas_s8 — Pallas s8 matmul variant sweep (#6)
#   trace_summary      — fused-headline-graph profiler trace (#4)
#   bench_r4_run{1..3} — headline stability, 3 consecutive runs (#1)
# One TPU client at a time; every command is leashed and logs raw
# output (no grep in the pipe — it buffers and eats the log on kill).
set -x
R4=experiments/results/r4
mkdir -p "$R4"

run() { # run <log> <cmd...>
  local log="$1"; shift
  timeout 2400 "$@" > "/tmp/$log.raw" 2>&1
  echo "rc=$?" >> "/tmp/$log.raw"
  grep -v WARNING "/tmp/$log.raw" > "$R4/$log.log"
}

# --- e2e: fixed-trip NMS (already run interactively; keep for rerun) ---
# run ab_nmsfixed_b8  python -u tools/bench_ab.py --int8 --conv-impl xla \
#     --stem s2d_int8 --int8-head --int8-rpn --nms blocked_fixed --batch 8
# run ab_nmsfixed_b16 python -u tools/bench_ab.py --int8 --conv-impl xla \
#     --stem s2d_int8 --int8-head --int8-rpn --nms blocked_fixed --batch 16

# --- train A/B matrix (batch defaults to 1 for --train since r4) ------
run ab_train_literal python -u tools/bench_ab.py --train --stem xla
run ab_train_s2d     python -u tools/bench_ab.py --train --stem s2d
run ab_train_s2d_b4  python -u tools/bench_ab.py --train --stem s2d --batch 4

# --- Pallas s8 microbench sweep ---------------------------------------
run microbench_pallas_s8 python -u tools/microbench_pallas_s8.py

# --- headline stability: 3 consecutive bench runs ---------------------
for i in 1 2 3; do
  run "bench_r4_run$i" python -u bench.py
done
