#!/bin/bash
# r5 TPU matrix: the runs behind experiments/results/r5/
#   ab_hybrid_*   — hybrid Pallas/XLA int8 trunk (requant-boundary
#                   attack, VERDICT r4 #2) vs the r4 headline configs
#   ab_knee_*     — pre-NMS 1024 knee re-confirmation on this tree (#1)
#   ab_b24/b32    — batch-occupancy sweep post-SMEM-chunk fix (#6)
#   ab_train_*    — train-graph levers: blocked_fixed NMS, pre-NMS
#                   knee, s2d stem (#4)
# One TPU client at a time; every command is leashed and logs raw
# output (no grep in the pipe — it buffers and eats the log on kill).
set -x
R5=experiments/results/r5
mkdir -p "$R5"

run() { # run <log> <cmd...>
  local log="$1"; shift
  timeout 2400 "$@" > "/tmp/$log.raw" 2>&1
  echo "rc=$?" >> "/tmp/$log.raw"
  grep -v WARNING "/tmp/$log.raw" > "$R5/$log.log"
}

# --- e2e: r4 headline reconfirm + knee on this tree -------------------
run ab_base_b16 python -u tools/bench_ab.py --int8 --conv-impl xla \
    --stem s2d_int8 --int8-head --int8-rpn --nms blocked_fixed --batch 16
run ab_knee_b16 python -u tools/bench_ab.py --int8 --conv-impl xla \
    --stem s2d_int8 --int8-head --int8-rpn --nms blocked_fixed \
    --pre-nms 1024 --batch 16

# --- hybrid conv impl (boundary attack) -------------------------------
run ab_hybrid_b16 python -u tools/bench_ab.py --int8 --conv-impl hybrid \
    --stem s2d_int8 --int8-head --int8-rpn --nms blocked_fixed --batch 16
run ab_hybrid_knee_b16 python -u tools/bench_ab.py --int8 \
    --conv-impl hybrid --stem s2d_int8 --int8-head --int8-rpn \
    --nms blocked_fixed --pre-nms 1024 --batch 16

# --- occupancy sweep on the best config -------------------------------
run ab_knee_b8  python -u tools/bench_ab.py --int8 --conv-impl xla \
    --stem s2d_int8 --int8-head --int8-rpn --nms blocked_fixed \
    --pre-nms 1024 --batch 8
run ab_knee_b24 python -u tools/bench_ab.py --int8 --conv-impl xla \
    --stem s2d_int8 --int8-head --int8-rpn --nms blocked_fixed \
    --pre-nms 1024 --batch 24
run ab_knee_b32 python -u tools/bench_ab.py --int8 --conv-impl xla \
    --stem s2d_int8 --int8-head --int8-rpn --nms blocked_fixed \
    --pre-nms 1024 --batch 32

# --- train-graph levers (batch 1 = reference recipe) ------------------
run ab_train_base      python -u tools/bench_ab.py --train
run ab_train_nmsfixed  python -u tools/bench_ab.py --train \
    --nms blocked_fixed
run ab_train_knee      python -u tools/bench_ab.py --train \
    --nms blocked_fixed --pre-nms 3072
run ab_train_s2d_fixed python -u tools/bench_ab.py --train --stem s2d \
    --nms blocked_fixed --pre-nms 3072
