#!/bin/bash
# Round-3 matrix, part 3 — the snapshot-free timing A/Bs from matrix2
# (steps 3-4), runnable before a trained snapshot exists. Sequential:
# one TPU client at a time (axon tunnel serializes; killed clients can
# wedge the worker).
# Usage: bash tools/r3_tpu_matrix3.sh [output_dir]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-experiments/results/r3}"
mkdir -p "$OUT"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? ($name)"; tail -2 "$OUT/$name.log"
  sleep 5
}

run probe3 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print('probe ok', float((x @ x).sum()), jax.devices()[0])"

# e2e A/B: the never-measured int8 head/rpn tails + the knee K
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

# train-step A/B (VERDICT #5: target <50 ms/iter)
run ab_train_literal2 1200 python tools/bench_ab.py --train
run ab_train_s2d2 1200 python tools/bench_ab.py --train --stem s2d
run ab_train_b4_2 1800 python tools/bench_ab.py --train --batch 4

echo "matrix3 done; logs in $OUT"
