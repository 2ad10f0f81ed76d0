#!/usr/bin/env bash
# Decode the test split to mel + optionally vocode — reference parity with
# /root/reference/inference_{teacher,student}.sh (shard -> decode -> PWG).
# Usage: scripts/inference.sh [teacher|student] [shard-count] [shard-index]
set -euo pipefail
cd "$(dirname "$0")/.."

ROLE=${1:-teacher}
PARTS=${2:-1}
IDX=${3:-1}
FEATURE_ROOT=${FEATURE_ROOT:-data}
EXP=${EXP:-exp/$ROLE}
CKPT=${CKPT:-$EXP/results/model.loss.best}

JSON="$FEATURE_ROOT/test_data.json"
if [ "$PARTS" -gt 1 ]; then
    python cli/fcl_splitjson.py "$JSON" --parts "$PARTS"
    JSON="$FEATURE_ROOT/split${PARTS}utt/test_data.${IDX}.json"
fi

python cli/fcl_synth.py \
    --model "$CKPT" \
    --json "$JSON" \
    --out "$EXP/outputs_$(basename "$CKPT")_$IDX"

# vocoding: feats.scp is parallel-wavegan-decode compatible; with the JAX
# PWG (fcl_taco2_tpu/vocoder) use cli/fcl_vocode.py instead.
