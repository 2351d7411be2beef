#!/bin/bash
# 2D Faster R-CNN end-to-end train -> test pipeline
# (experiments/scripts/faster_rcnn_end2end.sh parity):
#   ./experiments/scripts/faster_rcnn_end2end.sh DEV DEV_ID NET DATASET \
#       [--devkit_path P | --kitti_path P | --set KEY VALUE ...]
# DATASET is pascal_voc or coco; NET is VGGnet (the framework's 2D net).

set -x
set -e

export PYTHONUNBUFFERED="True"

DEV=$1
DEV_ID=$2
NET=$3
DATASET=$4

array=( $@ )
len=${#array[@]}
EXTRA_ARGS=${array[@]:4:$len}
EXTRA_ARGS_SLUG=${EXTRA_ARGS// /_}

case $DATASET in
  pascal_voc)
    TRAIN_IMDB="voc_2007_trainval"
    TEST_IMDB="voc_2007_test"
    ITERS=70000
    ;;
  coco)
    TRAIN_IMDB="coco_2014_train"
    TEST_IMDB="coco_2014_minival"
    ITERS=490000
    ;;
  *)
    echo "No dataset given"
    exit 1
    ;;
esac

LOG="experiments/logs/faster_rcnn_end2end_${NET}_${EXTRA_ARGS_SLUG}_$(date +'%Y-%m-%d_%H-%M-%S').txt"
exec &> >(tee -a "$LOG")
echo Logging output to "$LOG"

python tools/train_net.py --device ${DEV} --device_id ${DEV_ID} \
  --weights data/pretrain_model/VGG_imagenet.npy \
  --imdb ${TRAIN_IMDB} \
  --iters ${ITERS} \
  --cfg experiments/cfgs/faster_rcnn_end2end.yml \
  --network ${NET}_train \
  ${EXTRA_ARGS}

set +x
NET_FINAL=$(grep -B 1 "done solving\|Wrote snapshot" "$LOG" | grep "Wrote snapshot" | tail -n 1 | awk '{print $4}')
set -x

python tools/test_net.py --device ${DEV} --device_id ${DEV_ID} \
  --weights ${NET_FINAL} \
  --imdb ${TEST_IMDB} \
  --cfg experiments/cfgs/faster_rcnn_end2end.yml \
  --network ${NET}_test \
  ${EXTRA_ARGS}
