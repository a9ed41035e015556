#!/bin/bash
# wav2vec2-Large compression recipe (reference run_large.sh:13-55): 24-layer
# 1024-dim teacher, longer schedule, smaller per-chip batch.  The reference
# compensates batch size with grad-accum x3 on GPUs; on TPU the equivalent
# audio budget fits per step, so accumulation is unnecessary — raise
# SECONDS_PER_BATCH instead if memory allows.
set -euo pipefail

export TEACHER_CKPT=${TEACHER_CKPT:-pretrained/wav2vec2-large.hf.pth}
export SECONDS_PER_BATCH=${SECONDS_PER_BATCH:-180}
export EXP_DIR=${EXP_DIR:-exp/wav2vec2-large_sp0.75}

# REMAT+SCAN_LAYERS are REQUIRED for the 24-layer Large family: the
# unrolled backward exceeds the compile-server whole-graph limits, so the
# step only compiles with per-layer remat + lax.scan over the uniform
# layers (bench.py Large mode uses the same pair).  Stage 2's pruned
# heterogeneous student automatically falls back to the unrolled path
# while the uniform teacher still scans.
TSV_DIR=${TSV_DIR:-data/librispeech} \
TRAIN_SUBSET=${TRAIN_SUBSET:-train960} \
DISTILL_LAYERS="0.4,8,12,16,20,24" \
MAX_UPDATES=${MAX_UPDATES:-140000} WARMUP_UPDATES=${WARMUP_UPDATES:-42000} \
FINAL_MAX_UPDATES=${FINAL_MAX_UPDATES:-70000} \
FINAL_WARMUP_UPDATES=${FINAL_WARMUP_UPDATES:-14000} \
REMAT=${REMAT:-1} SCAN_LAYERS=${SCAN_LAYERS:-1} \
bash "$(dirname "$0")/run.sh"
