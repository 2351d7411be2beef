#!/bin/bash
# Round-3 matrix, part 2 — re-ranked after part 1's stage records:
# the fused Pallas stem measured 30.27 ms (loses to the 21.05 s2d XLA
# stem) and its full-graph compile stalled >10 min, so the s2d_fused
# A/B configs are dropped; batch-16 added (throughput target, batch is
# free). Sequential: one TPU client at a time.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-experiments/results/r3}"
mkdir -p "$OUT"
SNAP=$(ls -d output/accuracy_50k/VGGnet_fast_rcnn_iter_* 2>/dev/null \
       | grep -v tmp | awk -F_iter_ '{print $NF, $0}' | sort -n \
       | tail -1 | cut -d' ' -f2)
echo "snapshot: $SNAP"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? ($name)"; grep -E "frames/s|ms/iter|agree|AP|TOP" "$OUT/$name.log" | tail -4
  sleep 5
}

run probe2 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print('probe ok', float((x @ x).sum()), jax.devices()[0])"

# A/B: candidate fast configs
run ab_bf16_b16 1200 python tools/bench_ab.py --batch 16
run ab_bf16_s2d 1200 python tools/bench_ab.py --stem s2d
run ab_int8_xla_s2d 1200 python tools/bench_ab.py --int8 --conv-impl xla \
    --stem s2d --no-quant-pool
run ab_int8_default 1200 python tools/bench_ab.py --int8 --int8-head \
    --int8-rpn --conv-impl xla

# train-step A/B (VERDICT #5)
run ab_train_literal 1200 python tools/bench_ab.py --train
run ab_train_s2d 1200 python tools/bench_ab.py --train --stem s2d
run ab_train_b4 1800 python tools/bench_ab.py --train --batch 4

# pre-NMS knee on trained proposals (VERDICT #2)
[ -n "$SNAP" ] && run prenms_knee 2400 python tools/prenms_knee.py \
    --kitti_path /tmp/kitti_synth_50k --model "$SNAP" --frames 64

# int8 accuracy gate on trained weights (VERDICT #4)
[ -n "$SNAP" ] && run quant_check_trained 2400 python tools/quant_check.py \
    --kitti_path /tmp/kitti_synth_50k --model "$SNAP" --conv-impl xla

# BASELINE #5: shipping eval-driver timing (600-frame val)
[ -n "$SNAP" ] && run test_net_timing 3600 python tools/test_net.py \
    --weights "$SNAP" --imdb kitti_val --kitti_path /tmp/kitti_synth_50k

echo "matrix2 done; logs in $OUT"
