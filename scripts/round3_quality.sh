#!/bin/bash
# Round-3 quality program (serial TPU; see scripts/tpu_queue.sh for the
# queue runner actually used). Stages:
#   zh <target> <seed> [extra]  - flagship run with the restart-from-best fix
#                                 (scripts/zh_run.sh)
#   zh_ablate <target> <seed>   - same minus MMD (the MMD-effect experiment)
#   en_stage1                   - in-framework English stage 1 -> predicted
#                                 emotion pair file (VERDICT r2 item 3)
#   en_stage2                   - en flagship on the self-generated file
#   case_analysis A B           - MMD-vs-none checkpoint comparison split by
#                                 self-chain (mmd_wommd_case_analysis.py)
#   breakdown                   - step-time attribution + pallas A/B
set -euo pipefail
cd /root/repo
STAGE=${1:?usage: round3_quality.sh {zh|zh_ablate|en_stage1|en_stage2|case_analysis|breakdown} ...}

case "$STAGE" in
zh) exec bash scripts/zh_run.sh "${2:?target}" "${3:?seed}" "${4:-60}" ;;

zh_ablate)
  exec bash scripts/zh_run.sh "${2:?target}" "${3:?seed}" "${4:-60}" \
    --regularizer none ;;

en_stage1)
  exec python -m carel_tpu.cli stage1 --language en \
    --source_domain enecpe_num --target_domain reccon_test \
    --data_root /root/reference --encoder base \
    --hf_encoder runs/enc_en_wwm_70k_step40000 --carried_adam \
    --save_dir runs/pair_data/predicted_emotion/source_enecpe_num \
    --cache_dir runs/cache_en --log_dir runs/logs ;;

en_stage2)
  exec python -m carel_tpu.cli train --preset en_newsplit \
    --data_root /root/reference --encoder base \
    --test_file runs/pair_data/predicted_emotion/source_enecpe_num/reccon_test.txt \
    --hf_encoder runs/enc_en_wwm_70k_step40000 --vae_lr 1e-4 \
    --self_iteration 50 --self_strategy temporal_order_modification \
    --cache_dir runs/cache_en --log_dir runs/logs --checkpoint_dir runs/ckpt ;;

case_analysis)
  exec python -m carel_tpu.cli case_analysis \
    --preset ec_mmd_final_mul_newsplit_emnlp --data_root /root/reference \
    --encoder base --hf_encoder runs/enc_zh_wwm_100k \
    --target_domain "${2:?target}" \
    --model_id_a "${3:?mmd_model_id}" --model_id_b "${4:?none_model_id}" \
    --checkpoint_dir runs/ckpt --cache_dir runs/cache \
    --out_csv "runs/wommd_mmd_${2}.csv" ;;

breakdown) exec python scripts/step_breakdown.py ;;

*) echo "unknown stage: $STAGE" >&2; exit 2 ;;
esac
