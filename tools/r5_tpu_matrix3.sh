#!/bin/bash
# r5 matrix 3 (post-quality-run chip pipeline):
#   ab_stemfix_*  — phase-max-as-slices stem layout fix (kills the
#                   ~12.8 ms/b32 copy bracket, trace_knee_b32.log)
#   quant gate    — widened int8 gate (VERDICT r4 #1) on the retrained
#                   15k peak snapshot, exact headline config
#   bench.py      — full headline run (also re-seeds the compile cache
#                   for the driver's end-of-round run, VERDICT r4 #9)
#   trace_train   — train-step class attribution (VERDICT r4 #4)
set -x
R5=experiments/results/r5
mkdir -p "$R5"

run() { # run <log> <cmd...>
  local log="$1"; shift
  timeout 2400 "$@" > "/tmp/$log.raw" 2>&1
  echo "rc=$?" >> "/tmp/$log.raw"
  grep -v WARNING "/tmp/$log.raw" > "$R5/$log.log"
}

run ab_stemfix_knee_b32 python -u tools/bench_ab.py --int8 \
    --conv-impl xla --stem s2d_int8 --int8-head --int8-rpn \
    --nms blocked_fixed --pre-nms 1024 --batch 32
run ab_stemfix_knee_b16 python -u tools/bench_ab.py --int8 \
    --conv-impl xla --stem s2d_int8 --int8-head --int8-rpn \
    --nms blocked_fixed --pre-nms 1024 --batch 16

run quant_gate_r5 python -u tools/quant_check.py \
    --kitti_path /tmp/kitti_synth_q --frames 128 --calib_frames 16 \
    --batch 16 --model output/accuracy_q/VGGnet_fast_rcnn_iter_15000 \
    --stem s2d_int8 --int8-head --int8-rpn --pre-nms 1024 \
    --nms blocked_fixed

run bench_r5_full python -u bench.py

run trace_train_base python -u tools/trace_train.py --steps 10 \
    --out /tmp/trace_train_base --top 30
