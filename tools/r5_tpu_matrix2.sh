#!/bin/bash
# r5 matrix 2: ROI-pool kernel levers on the knee headline config
#   ab_cwin8_*  — column-bin window 16 -> 8 (~2x less masked reduce
#                 work per bin at typical 1-3 cell bins)
#   ab_rt25_*   — rois_per_step 12 -> 25 (fewer grid steps; 300 % 25 == 0)
# Same leash/log discipline as r5_tpu_matrix.sh.
set -x
R5=experiments/results/r5
mkdir -p "$R5"

run() { # run <log> <cmd...>
  local log="$1"; shift
  timeout 2400 "$@" > "/tmp/$log.raw" 2>&1
  echo "rc=$?" >> "/tmp/$log.raw"
  grep -v WARNING "/tmp/$log.raw" > "$R5/$log.log"
}

# occupancy: b32 (177.5 fps) beat b16 (167.1) in matrix 1 — the curve
# rises again past the b24 dip (uneven 4800+2400 pool chunk split);
# probe the tail.
run ab_knee_b48 python -u tools/bench_ab.py --int8 --conv-impl xla \
    --stem s2d_int8 --int8-head --int8-rpn --nms blocked_fixed \
    --pre-nms 1024 --batch 48
run ab_knee_b64 python -u tools/bench_ab.py --int8 --conv-impl xla \
    --stem s2d_int8 --int8-head --int8-rpn --nms blocked_fixed \
    --pre-nms 1024 --batch 64

# conv-impl A/B: XLA's s8 dot_general sustains ~198 TOP/s vs 85-114 for
# its s8 conv lowering (microbench_int8, r4) — never measured e2e; the
# im2col/dots forms may also let XLA fuse the requant epilogue into the
# dot's output fusion (the ~29 ms boundary class, VERDICT r4 #2).
run ab_im2col_knee_b16 python -u tools/bench_ab.py --int8 \
    --conv-impl im2col --stem s2d_int8 --int8-head --int8-rpn \
    --nms blocked_fixed --pre-nms 1024 --batch 16
run ab_dots_knee_b16 python -u tools/bench_ab.py --int8 \
    --conv-impl dots --stem s2d_int8 --int8-head --int8-rpn \
    --nms blocked_fixed --pre-nms 1024 --batch 16

# ab_cwin8_knee_b16 ran standalone: 163.6 fps vs 167.1 (CWIN=8 LOSES —
# segment-loop overhead beats the saved masked-reduce work; default stays 16)
run ab_rt25_knee_b16 python -u tools/bench_ab.py --int8 --conv-impl xla \
    --stem s2d_int8 --int8-head --int8-rpn --nms blocked_fixed \
    --pre-nms 1024 --batch 16 --rois-per-step 25
run ab_rt25_knee_b32 python -u tools/bench_ab.py --int8 \
    --conv-impl xla --stem s2d_int8 --int8-head --int8-rpn \
    --nms blocked_fixed --pre-nms 1024 --batch 32 --rois-per-step 25
