#!/bin/bash
# One zh flagship quality run with the round-2 recipe (WWM-100k encoder,
# vae_lr 1e-4). Usage: zh_run.sh <target_domain> <seed> <self_iteration> [extra flags...]
set -euo pipefail
cd /root/repo
TGT=${1:?target}; SEED=${2:?seed}; ITERS=${3:?iters}; shift 3
exec python -m carel_tpu.cli train --preset ec_mmd_final_mul_newsplit_emnlp \
  --data_root /root/reference --encoder base --target_domain "$TGT" \
  --hf_encoder runs/enc_zh_wwm_100k --vae_lr 1e-4 \
  --seed "$SEED" --self_iteration "$ITERS" \
  --cache_dir runs/cache --log_dir runs/logs --checkpoint_dir runs/ckpt "$@"
