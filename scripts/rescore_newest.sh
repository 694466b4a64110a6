#!/bin/bash
# Queue helper: rescore the NEWEST *_best checkpoint under both pair-F1
# protocols (reference-gate + forced-miss, scripts/ref_protocol_f1.py) on
# the ambient backend (the TPU, inside the serial queue — one process on
# the tunnel). The queue is serial, so "newest" is the arm that just
# finished. Appends the JSON line to runs/logs/rescore_auto.jsonl.
#
# Usage: rescore_newest.sh <target_domain> [extra ref_protocol_f1 args...]
set -euo pipefail
cd /root/repo
newest=$(ls -dt runs/ckpt/*_best 2>/dev/null | head -1 || true)  # orbax dirs: -d
if [ -z "${newest:-}" ]; then echo "no checkpoints in runs/ckpt"; exit 1; fi
id=$(basename "$newest"); id=${id%_best}
echo "rescoring newest checkpoint: $id ($*)"
CAREL_EVAL_DEVICE=native python scripts/ref_protocol_f1.py "$id" "$@" \
  | tee -a runs/logs/rescore_auto.jsonl
