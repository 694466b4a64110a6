#!/bin/bash
# Round-2 quality pipeline (run stages individually; ONE TPU process at a time).
# Stage A (zh MLM) is launched separately:
#   python -m carel_tpu.cli pretrain --preset ec_mmd_final_mul_newsplit_emnlp \
#     --data_root /root/reference --corpus data/all_data_pair_zh.txt \
#     domains/THUCTC/*.txt domains/Chinanews/*.txt data/category/*.txt \
#     --steps 100000 --whole_word --lr_decay --warmup_steps 5000 \
#     --save_every 20000 --cache_dir runs/cache --log_dir runs/logs \
#     --out runs/enc_zh_wwm_100k
set -euo pipefail
cd /root/repo
STAGE=${1:?usage: round2_quality.sh {zh_quality|zh_chain_stage1|zh_chain_stage2|zh_quality_tgt|en_mlm|en_quality|infer_cit}}

case "$STAGE" in
zh_quality)  # flagship home->education, WWM-100k encoder, reference schedule
  exec python -m carel_tpu.cli train --preset ec_mmd_final_mul_newsplit_emnlp \
    --data_root /root/reference --encoder base \
    --hf_encoder runs/enc_zh_wwm_100k --vae_lr 1e-4 --self_iteration 100 \
    --cache_dir runs/cache --log_dir runs/logs --checkpoint_dir runs/ckpt ;;

zh_chain_stage1)  # in-framework stage 1 writes predicted-emotion pair files
  exec python -m carel_tpu.cli stage1 --language zh \
    --source_domain home --target_domain education \
    --data_root /root/reference --encoder base \
    --hf_encoder runs/enc_zh_wwm_100k \
    --save_dir runs/pair_data/predicted_emotion/source_home \
    --cache_dir runs/cache --log_dir runs/logs ;;

zh_chain_stage2)  # flagship on the stage-1 files generated in-framework
  exec python -m carel_tpu.cli train --preset ec_mmd_final_mul_newsplit_emnlp \
    --data_root /root/reference --encoder base \
    --test_file runs/pair_data/predicted_emotion/source_home/education.txt \
    --hf_encoder runs/enc_zh_wwm_100k --vae_lr 1e-4 --self_iteration 50 \
    --cache_dir runs/cache --log_dir runs/logs --checkpoint_dir runs/ckpt ;;

en_mlm)  # English MLM: ECPE+RECCON corpus + amazon raw text, WordPiece WWM
  exec python -m carel_tpu.cli pretrain --preset en_newsplit \
    --data_root /root/reference \
    --corpus /root/reference/data/ecpe_and_reccon_all_data_pair_en.txt \
    --raw_corpus /root/reference/data/amazon/Books/Bookstrain.txt \
      /root/reference/data/amazon/Books/Bookstest.txt \
      /root/reference/data/amazon/Dvd/Dvdtrain.txt \
      /root/reference/data/amazon/Dvd/Dvdtest.txt \
      /root/reference/data/amazon/Electronics/Electronicstrain.txt \
      /root/reference/data/amazon/Electronics/Electronicstest.txt \
      /root/reference/data/amazon/Kitchen/Kitchentrain.txt \
      /root/reference/data/amazon/Kitchen/Kitchentest.txt \
    --steps 80000 --whole_word --mask_prob 0.3 --lr_decay --warmup_steps 4000 \
    --save_every 20000 --cache_dir runs/cache_en --log_dir runs/logs \
    --out runs/enc_en_wwm_80k ;;

zh_quality_tgt)  # slack stage: same recipe, another target domain ($2)
  exec python -m carel_tpu.cli train --preset ec_mmd_final_mul_newsplit_emnlp \
    --data_root /root/reference --encoder base --target_domain "${2:?target}" \
    --hf_encoder runs/enc_zh_wwm_100k --vae_lr 1e-4 --self_iteration 50 \
    --cache_dir runs/cache --log_dir runs/logs --checkpoint_dir runs/ckpt ;;

en_quality)  # first English quality run: enecpe_num -> reccon_test
  exec python -m carel_tpu.cli train --preset en_newsplit \
    --data_root /root/reference --encoder base \
    --hf_encoder "${2:-runs/enc_en_wwm_70k}" --vae_lr 1e-4 --self_iteration 50 \
    --self_strategy temporal_order_modification \
    --cache_dir runs/cache_en --log_dir runs/logs --checkpoint_dir runs/ckpt ;;

infer_cit)  # full inference -> CIT chain on a trained checkpoint ($2=model_id)
  python -m carel_tpu.cli infer --preset ec_mmd_final_mul_newsplit_emnlp \
    --data_root /root/reference --encoder base --model_id "${2:?model_id}" \
    --hf_encoder runs/enc_zh_wwm_100k \
    --checkpoint_dir runs/ckpt --cache_dir runs/cache --log_dir runs/logs \
    --output_dir runs/pair_data/ec_pair
  exec python -m carel_tpu.cli cit \
    --pred_pkl "runs/pair_data/ec_pair/${2}_pred.pkl" \
    --true_pkl "runs/pair_data/ec_pair/${2}_true.pkl" \
    --cache_dir runs/cache --log_dir runs/logs ;;

*) echo "unknown stage: $STAGE" >&2; exit 2 ;;
esac
