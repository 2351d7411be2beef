#!/bin/bash
# Round-2 TPU measurement matrix — run once the device tunnel is back.
# Strictly sequential (one TPU client at a time; the axon tunnel wedges
# under concurrent clients). Logs to /tmp/r2m_*.log, summary at the end.
set -u
cd "$(dirname "$0")/.."
run() {  # run <tag> <cmd...>
  local tag="$1"; shift
  echo "=== $tag: $* ==="
  timeout 1800 "$@" > "/tmp/r2m_$tag.log" 2>&1
  local rc=$?
  tail -n 6 "/tmp/r2m_$tag.log" | grep -v WARNING
  echo "=== $tag rc=$rc ==="
}

# 1. kernel validation on real hardware (new s8 kernels + s2d stem)
run selfcheck python tools/tpu_selfcheck.py

# 2. v2 conv kernel speed vs v1/XLA ceilings
run microbench python tools/microbench_int8.py --pallas

# 3. detector A/B matrix (each in its own process; compile cache shared)
run ab_s2d        python tools/bench_ab.py --stem s2d
run ab_int8_pal   python tools/bench_ab.py --int8 --conv-impl pallas --stem xla
run ab_full       python tools/bench_ab.py --int8 --int8-head --int8-rpn \
                      --conv-impl pallas --stem s2d_int8
run ab_full_xlas  python tools/bench_ab.py --int8 --int8-head --int8-rpn \
                      --conv-impl xla --stem s2d
run ab_full_b1    python tools/bench_ab.py --batch 1 --int8 --int8-head \
                      --int8-rpn --conv-impl pallas --stem s2d_int8
run ab_pool60     python tools/bench_ab.py --int8 --int8-head --int8-rpn \
                      --conv-impl pallas --stem s2d_int8 --rois-per-step 60
# 4. train-step A/B (literal vs s2d stem; batched variant)
run tr_lit        python tools/bench_ab.py --train --batch 1
run tr_s2d        python tools/bench_ab.py --train --batch 1 --stem s2d
run tr_b4         python tools/bench_ab.py --train --batch 4

# 5. int8 accuracy gate at the fastest config
run quant_check   python tools/quant_check.py --kitti_path /tmp/kitti_synth_50k \
                      --frames 8 --int8-head --int8-rpn \
                      --conv-impl pallas --stem s2d_int8

echo; echo "======= SUMMARY ======="
for f in /tmp/r2m_*.log; do
  echo "--- $f"
  grep -E "frames/s|ms/iter|TOP/s|ALL OK|FAILURES|ap_" "$f" | tail -n 8
done
