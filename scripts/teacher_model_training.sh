#!/usr/bin/env bash
# Teacher (FCL-taco2-T) training workflow — reference parity with
# /root/reference/teacher_model_training.sh (seed 137, batch 32, no KD).
set -euo pipefail
cd "$(dirname "$0")/.."

FEATURE_ROOT=${FEATURE_ROOT:-data}
EXP=${EXP:-exp/teacher}

python cli/fcl_train.py \
    --config conf/train_fcl_taco2.teacher.yaml \
    --train-json "$FEATURE_ROOT/train_data.json" \
    --valid-json "$FEATURE_ROOT/val_data.json" \
    --outdir "$EXP/results" \
    --seed 137 \
    --batch-size 32 \
    --perform-KD False \
    "$@"
