#!/usr/bin/env bash
# Student (FCL-taco2-S) KD training workflow — reference parity with
# /root/reference/student_model_training.sh (--perform-KD --share-proj).
set -euo pipefail
cd "$(dirname "$0")/.."

FEATURE_ROOT=${FEATURE_ROOT:-data}
EXP=${EXP:-exp/student}
TEACHER_CKPT=${TEACHER_CKPT:-exp/teacher/results/model.loss.best}

python cli/fcl_train.py \
    --config conf/train_fcl_taco2.student.yaml \
    --train-json "$FEATURE_ROOT/train_data.json" \
    --valid-json "$FEATURE_ROOT/val_data.json" \
    --outdir "$EXP/results" \
    --seed 137 \
    --batch-size 32 \
    --perform-KD True \
    --share-proj True \
    --teacher-config conf/train_fcl_taco2.teacher.yaml \
    --teacher-checkpoint "$TEACHER_CKPT" \
    "$@"
