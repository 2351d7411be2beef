#!/bin/bash
# Round-3 on-chip measurement matrix (sequential: ONE TPU client at a
# time — the axon tunnel serializes processes and a killed client can
# wedge the worker). Run AFTER the 50k recipe run exits.
# Usage: bash tools/r3_tpu_matrix.sh [output_dir]
# Logs land in experiments/results/r3/ so they get committed (the r2
# matrix wrote to /tmp and the numbers were lost — VERDICT weak #1).
set -u
cd "$(dirname "$0")/.."
OUT="${1:-experiments/results/r3}"
mkdir -p "$OUT"
SNAP=$(ls -d output/accuracy_50k/VGGnet_fast_rcnn_iter_* 2>/dev/null \
       | grep -v tmp | awk -F_iter_ '{print $NF, $0}' | sort -n \
       | tail -1 | cut -d' ' -f2)
echo "snapshot: $SNAP"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? ($name)"; tail -3 "$OUT/$name.log"
  sleep 5
}

# 0. probe: tiny matmul (worker sanity after the long training run)
run probe 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print('probe ok', float((x @ x).sum()), jax.devices()[0])"

# 1. selfcheck (validates windowed pool + fused stem on-chip)
run selfcheck2 1800 python tools/tpu_selfcheck.py

# 2. the never-measured Pallas s8 matmul ceiling (PERF.md TBD cell)
run microbench_pallas 1200 python tools/microbench_int8.py --pallas

# 3. stage profile with the fused s2d stem + windowed pool
run profile_stages2 1800 python tools/profile_stages.py
run profile_stages2_int8 1800 python tools/profile_stages.py --int8

# 4. A/B matrix: candidate fast configs (each its own process so a
#    Mosaic fault can't take down the matrix)
run ab_bf16_s2dfused 1200 python tools/bench_ab.py --stem s2d_fused
run ab_int8_xla_s2dfused 1200 python tools/bench_ab.py --int8 \
    --conv-impl xla --stem s2d_fused --no-quant-pool
run ab_int8_full 1200 python tools/bench_ab.py --int8 --int8-head \
    --int8-rpn --conv-impl xla --stem s2d_fused --no-quant-pool
run ab_bf16_base 1200 python tools/bench_ab.py

# 5. train-step A/B (VERDICT #5: target <50 ms/iter)
run ab_train_literal 1200 python tools/bench_ab.py --train
run ab_train_s2d 1200 python tools/bench_ab.py --train --stem s2d
run ab_train_b4 1800 python tools/bench_ab.py --train --batch 4

# 6. pre-NMS knee on TRAINED proposals (VERDICT #2)
[ -n "$SNAP" ] && run prenms_knee 2400 python tools/prenms_knee.py \
    --kitti_path /tmp/kitti_synth_50k --model "$SNAP" --frames 64

# 7. int8 accuracy gate on TRAINED weights (VERDICT #4)
[ -n "$SNAP" ] && run quant_check_trained 2400 python tools/quant_check.py \
    --kitti_path /tmp/kitti_synth_50k --model "$SNAP" \
    --conv-impl xla --stem s2d_fused

# 8. BASELINE #5: shipping eval-driver timing over the synthetic val
[ -n "$SNAP" ] && run test_net_timing 3600 python tools/test_net.py \
    --weights "$SNAP" --imdb kitti_val --kitti_path /tmp/kitti_synth_50k

echo "matrix done; logs in $OUT"
