#!/bin/bash
# Round-3 measurement matrix, part 2 — runs AFTER the 50k recipe run
# frees the chip. Sequential (one TPU client at a time; the axon tunnel
# serializes processes and a killed client can wedge the worker).
# Usage: bash tools/r3_tpu_matrix2.sh [output_dir]
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

# 0. worker sanity
run probe3 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print('probe ok', float((x @ x).sum()), jax.devices()[0])"

# 0b. selfcheck: the pool kernel's column stage changed (CWIN segment
#     loop) — prove bit-exactness on real hardware before measuring
run selfcheck3 1800 python tools/tpu_selfcheck.py

# 1. pre-NMS knee on TRAINED proposals (VERDICT #2): keep-set agreement,
#    AP, and detect time per K — picks the K for the fast configs below
run prenms_knee 2400 python tools/prenms_knee.py \
    --kitti_path /tmp/kitti_synth_50k --model "$SNAP" --frames 64

# 2. int8 accuracy gates on TRAINED weights (VERDICT #4) — one per
#    shipping fast config
run quant_check_xla_s2d 2400 python tools/quant_check.py \
    --kitti_path /tmp/kitti_synth_50k --model "$SNAP" \
    --conv-impl xla --stem s2d
run quant_check_head_rpn 2400 python tools/quant_check.py \
    --kitti_path /tmp/kitti_synth_50k --model "$SNAP" \
    --conv-impl xla --stem s2d --int8-head --int8-rpn

# 3. e2e A/B: the never-measured int8 head/rpn tails + the knee K
run ab_int8_head 1200 python tools/bench_ab.py --int8 --int8-head \
    --conv-impl xla --stem s2d --no-quant-pool
run ab_int8_head_rpn 1200 python tools/bench_ab.py --int8 --int8-head \
    --int8-rpn --conv-impl xla --stem s2d --no-quant-pool
run ab_int8_knee 1200 python tools/bench_ab.py --int8 \
    --conv-impl xla --stem s2d --pre-nms 1024
run ab_int8_full_knee 1200 python tools/bench_ab.py --int8 --int8-head \
    --int8-rpn --conv-impl xla --stem s2d --no-quant-pool --pre-nms 1024
run ab_int8_b16 1500 python tools/bench_ab.py --int8 \
    --conv-impl xla --stem s2d --batch 16
run ab_int8_full_b16 1500 python tools/bench_ab.py --int8 --int8-head \
    --int8-rpn --conv-impl xla --stem s2d --no-quant-pool \
    --pre-nms 1024 --batch 16

# 4. train-step A/B (VERDICT #5: target <50 ms/iter; batch defaults to 1
#    for --train now, and the vmapped batch>1 path remats+chunks the
#    xla pool so it no longer OOMs)
run ab_train_literal2 1200 python tools/bench_ab.py --train
run ab_train_s2d2 1200 python tools/bench_ab.py --train --stem s2d
run ab_train_b4_2 1800 python tools/bench_ab.py --train --batch 4

# 5. BASELINE #5: shipping eval-driver timing over the synthetic val
run test_net_timing 3600 python tools/test_net.py \
    --weights "$SNAP" --imdb kitti_val --kitti_path /tmp/kitti_synth_50k \
    --cfg experiments/cfgs/faster_rcnn_end2end.yml

echo "matrix2 done; logs in $OUT"
