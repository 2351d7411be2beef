#!/bin/bash
# Round-3 matrix, part 4 — runs AFTER the quality-mode recipe run frees
# the chip and produces output/accuracy_q/VGGnet_fast_rcnn_iter_20000.
# Sequential: one TPU client at a time (axon tunnel serializes).
# Usage: bash tools/r3_tpu_matrix4.sh [output_dir]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-experiments/results/r3}"
SNAP="${SNAP:-output/accuracy_q/VGGnet_fast_rcnn_iter_20000}"
mkdir -p "$OUT"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? ($name)"; tail -3 "$OUT/$name.log" | grep -v WARNING
  sleep 5
}

# 1. int8 accuracy gate on TRAINED weights (VERDICT #4), shipping config
run quant_check_trained 2400 python tools/quant_check.py \
    --kitti_path /tmp/kitti_synth_q --model "$SNAP" \
    --conv-impl xla --stem s2d

# 2. the untried trunk levers: s8 dot-path trunks (198 TOP/s dot
#    ceiling vs ~100 for XLA s8 convs) with the winning s2d stem.
#    dots = 9 shifted matmuls (9 s32 acc round-trips); im2col = ONE
#    (BHW, 9C) matmul over a materialized 9x s8 im2col tensor.
run ab_int8_dots_s2d 1500 python tools/bench_ab.py --int8 \
    --conv-impl dots --stem s2d
run ab_int8_im2col_s2d 1500 python tools/bench_ab.py --int8 \
    --conv-impl im2col --stem s2d

# 3. train-step A/B reruns (VERDICT #5; OOM fix 59c7e58 landed after
#    the originals died)
run ab_train_s2d3 1200 python tools/bench_ab.py --train --stem s2d
run ab_train_b4_3 1800 python tools/bench_ab.py --train --batch 4

echo "matrix4 done; logs in $OUT"
