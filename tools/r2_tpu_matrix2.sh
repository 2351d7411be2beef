#!/bin/bash
# Round-2 TPU matrix, part 2: configs that failed in part 1 (int8 pool
# lowering + conv2x2 VMEM cap, both fixed) plus the new conv-impl=dots
# (9 shifted s8 matmuls) formulation. Strictly sequential.
set -u
cd "$(dirname "$0")/.."
run() {
  local tag="$1"; shift
  echo "=== $tag: $* ==="
  timeout 1800 "$@" > "/tmp/r2n_$tag.log" 2>&1
  local rc=$?
  tail -n 6 "/tmp/r2n_$tag.log" | grep -v WARNING
  echo "=== $tag rc=$rc ==="
}

# 0. kernel validation incl. the int32-accumulator pool fix (check 9)
run selfcheck python tools/tpu_selfcheck.py

# 1. s8 conv formulations on the XLA side (bf16 / s8conv / im2col / 9dots)
run microbench python tools/microbench_int8.py

# 2. the configs part 1 could not measure
run ab_int8_pal   python tools/bench_ab.py --int8 --conv-impl pallas --stem xla
run ab_full       python tools/bench_ab.py --int8 --int8-head --int8-rpn \
                      --conv-impl pallas --stem s2d_int8
run ab_full_xlas  python tools/bench_ab.py --int8 --int8-head --int8-rpn \
                      --conv-impl xla --stem s2d
# 3. the dots trunk
run ab_dots       python tools/bench_ab.py --int8 --conv-impl dots --stem xla
run ab_dots_full  python tools/bench_ab.py --int8 --int8-head --int8-rpn \
                      --conv-impl dots --stem s2d
run ab_dots_s2d8  python tools/bench_ab.py --int8 --int8-head --int8-rpn \
                      --conv-impl dots --stem s2d_int8

echo; echo "======= SUMMARY ======="
for f in /tmp/r2n_*.log; do
  echo "--- $f"
  grep -E "frames/s|ms/iter|TOP/s|TF/s|ALL OK|FAILURES" "$f" | tail -n 8
done
