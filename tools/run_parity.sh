#!/usr/bin/env bash
# End-to-end mIoU-parity runbook for BASELINE.json configs #2 / #3 — run the
# day a real dataset tree is mounted (this build environment is offline, so
# the script validates its inputs and refuses to fake anything).
#
# Config #2 (default): ResNet-101 -> MobileNetV2 KD on VOC trainaug 513².
#   ./tools/run_parity.sh voc /path/to/VOCdevkit/VOC2012 teacher.pth
# Config #3: Xception-65 -> depthwise-separable student, Cityscapes 769².
#   ./tools/run_parity.sh cityscapes /path/to/cityscapes teacher.pth
#
# teacher.pth may be a reference-format torch checkpoint (imported via
# tools/convert_torch_ckpt.py mapping) or an Orbax dir from a prior run of
# this framework; omit it to first TRAIN a teacher from scratch (slow).
set -euo pipefail
cd "$(dirname "$0")/.."

DATASET="${1:?usage: run_parity.sh voc|cityscapes DATA_ROOT [TEACHER_CKPT]}"
DATA_ROOT="${2:?need DATA_ROOT}"
TEACHER_CKPT="${3:-}"

[ -e "$DATA_ROOT" ] || { echo "DATA_ROOT $DATA_ROOT does not exist" >&2; exit 2; }

if [ "$DATASET" = "voc" ]; then
  MODEL=deeplabv3plus_mobilenet
  TEACHER=deeplabv3plus_resnet101
  CROP=513; ITRS=30000; BATCH=16; LR=0.01
  EXTRA=(--image_set trainaug --year 2012)
  SCOPE=()                            # whole-model default replacement
elif [ "$DATASET" = "cityscapes" ]; then
  MODEL=deeplabv3plus_xception
  TEACHER=deeplabv3plus_xception
  CROP=769; ITRS=90000; BATCH=8; LR=0.1
  EXTRA=()
  # Config #3's separable student: the Xception backbone is already
  # depthwise-separable, so the reference's `--separable_conv` analogue is
  # converting the HEAD's dense 3x3s (ASPP + decoder). Explicit scope —
  # the whole-model default would silently touch only the two entry convs.
  SCOPE=(--replace_scope classifier)
else
  echo "dataset must be voc or cityscapes" >&2; exit 2
fi

CKPT_DIR=checkpoints/parity_${DATASET}
mkdir -p "$CKPT_DIR"

if [ -z "$TEACHER_CKPT" ]; then
  echo "== no teacher checkpoint given: training the teacher first =="
  python main.py --dataset "$DATASET" --data_root "$DATA_ROOT" \
    --model "$TEACHER" --output_stride 16 --crop_size "$CROP" \
    --batch_size "$BATCH" --lr "$LR" --total_itrs "$ITRS" \
    --val_interval 1000 --bf16 --ckpt_dir "$CKPT_DIR" "${EXTRA[@]}"
  TEACHER_CKPT="$CKPT_DIR/best_${TEACHER}_${DATASET}_os16"
fi

echo "== KD train: $TEACHER -> $MODEL (cheap-conv student) =="
python main.py --dataset "$DATASET" --data_root "$DATA_ROOT" \
  --model "$MODEL" --output_stride 16 --crop_size "$CROP" \
  --batch_size "$BATCH" --lr "$LR" --total_itrs "$ITRS" \
  --val_interval 1000 --bf16 --ckpt_dir "$CKPT_DIR" "${EXTRA[@]}" \
  --kd --teacher_model "$TEACHER" --teacher_ckpt "$TEACHER_CKPT" \
  --kd_temperature 4.0 --kd_alpha 0.5 --kd_beta 0.5 "${SCOPE[@]}"

echo "== final val (multi-scale + flip TTA, config #5 path) =="
python main.py --dataset "$DATASET" --data_root "$DATA_ROOT" \
  --model "$MODEL" --output_stride 16 --crop_size "$CROP" --bf16 \
  --kd --test_only --tta \
  --ckpt "$CKPT_DIR/best_${MODEL}_${DATASET}_os16" "${EXTRA[@]}"
