#!/bin/bash
# Train -> test pipeline (experiments/scripts/mv3d.sh parity):
#   ./experiments/scripts/mv3d.sh DEVICE DEVICE_ID WEIGHTS DATASET [ITERS] [KITTI_PATH]
# Logs tee to experiments/logs/ and the produced snapshot feeds test_net.

set -x
set -e

export PYTHONUNBUFFERED="True"

DEV=$1
DEV_ID=$2
WEIGHTS=$3
DATASET=$4
ITERS=${5:-50001}
KITTI_PATH=${6:-}

case $DATASET in
  kitti_train|kitti_trainval)
    TRAIN_IMDB=$DATASET
    TEST_IMDB="kitti_val"
    ;;
  *)
    echo "No dataset given"
    exit 1
    ;;
esac

EXTRA=""
if [ -n "$KITTI_PATH" ]; then
  EXTRA="--kitti_path ${KITTI_PATH}"
fi
WEIGHTS_ARG=""
if [ -n "$WEIGHTS" ] && [ "$WEIGHTS" != "none" ]; then
  WEIGHTS_ARG="--weights ${WEIGHTS}"
fi

LOG="experiments/logs/mv3d_${DATASET}_$(date +'%Y-%m-%d_%H-%M-%S').txt"
exec &> >(tee -a "$LOG")
echo Logging output to "$LOG"

python tools/train_net.py --device ${DEV} --device_id ${DEV_ID} \
  ${WEIGHTS_ARG} \
  --imdb ${TRAIN_IMDB} \
  --iters ${ITERS} \
  --cfg experiments/cfgs/faster_rcnn_end2end.yml \
  --network MV3D_train \
  ${EXTRA}

set +x
NET_FINAL=$(grep -B 1 "done solving\|Wrote snapshot" "$LOG" | grep "Wrote snapshot" | tail -n 1 | awk '{print $4}')
set -x

python tools/test_net.py --device ${DEV} --device_id ${DEV_ID} \
  --weights ${NET_FINAL} \
  --imdb ${TEST_IMDB} \
  --cfg experiments/cfgs/faster_rcnn_end2end.yml \
  --network MV3D_test \
  ${EXTRA}
