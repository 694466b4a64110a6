#!/bin/bash
# Full CAREL-VAE reproduction pipeline (the reference's job_group_devin.sh
# workflow, end to end). DATA_ROOT must contain the reference's data/,
# domains/ and pair_data/ trees.
set -euo pipefail

DATA_ROOT=${DATA_ROOT:-/root/reference}
OUT=${OUT:-./runs}
ENCODER=${ENCODER:-base}            # or --hf_encoder /path/to/checkpoint
SOURCE=${SOURCE:-home}
TARGET=${TARGET:-education}

mkdir -p "$OUT"

# (optional) bootstrap an encoder when no pretrained checkpoint is available
# python -m carel_tpu.cli pretrain --preset ec_mmd_final_mul_newsplit_emnlp \
#     --data_root "$DATA_ROOT" --steps 20000 --out "$OUT/encoder_mlm"

# stage 1: document-level emotion detection -> predicted-emotion pair files
python -m carel_tpu.cli stage1 \
    --language zh --source_domain "$SOURCE" --target_domain "$TARGET" \
    --data_root "$DATA_ROOT" --encoder "$ENCODER" \
    --save_dir "$OUT/pair_data/predicted_emotion/source_${SOURCE}" \
    --cache_dir "$OUT/cache" --log_dir "$OUT/logs"

# stage 2: the flagship (drl_classifier_ec_mmd_final_mul_newsplit_emnlp)
MODEL_ID=$(python -m carel_tpu.cli train \
    --preset ec_mmd_final_mul_newsplit_emnlp \
    --data_root "$DATA_ROOT" --encoder "$ENCODER" \
    --source_domain "$SOURCE" --target_domain "$TARGET" \
    --checkpoint_dir "$OUT/ckpt" --cache_dir "$OUT/cache" \
    --log_dir "$OUT/logs" | tail -1 | python -c \
    "import json,sys; print(json.load(sys.stdin)['model_id'])")

# batched pair inference with the best checkpoint
python -m carel_tpu.cli infer \
    --preset ec_mmd_final_mul_newsplit_emnlp \
    --data_root "$DATA_ROOT" --encoder "$ENCODER" \
    --source_domain "$SOURCE" --target_domain "$TARGET" \
    --model_id "$MODEL_ID" --checkpoint_dir "$OUT/ckpt" \
    --cache_dir "$OUT/cache" --output_dir "$OUT/pair_data/ec_pair"

# ablation example: the same run with MMD removed, then case analysis
ABLATION_ID=$(python -m carel_tpu.cli train \
    --preset ec_mmd_final_mul_newsplit_emnlp --regularizer none \
    --data_root "$DATA_ROOT" --encoder "$ENCODER" \
    --source_domain "$SOURCE" --target_domain "$TARGET" \
    --checkpoint_dir "$OUT/ckpt" --cache_dir "$OUT/cache" \
    --log_dir "$OUT/logs" | tail -1 | python -c \
    "import json,sys; print(json.load(sys.stdin)['model_id'])")

python -m carel_tpu.cli case_analysis \
    --preset ec_mmd_final_mul_newsplit_emnlp \
    --data_root "$DATA_ROOT" --encoder "$ENCODER" \
    --source_domain "$SOURCE" --target_domain "$TARGET" \
    --model_id_a "$MODEL_ID" --model_id_b "$ABLATION_ID" \
    --checkpoint_dir "$OUT/ckpt" --cache_dir "$OUT/cache" \
    --out_csv "$OUT/wommd_mmd_fin.csv"
