#!/bin/bash
# Round-5 night orchestrator (v2 — replaces r5_takeover.sh).
#
# Ambient tunnel load halved the step rate (~2.0 steps/s vs 5.0), making
# the full 50k+25k WavLM schedule impossible before the round-end
# deadline.  Forced-truncation triage, most-valuable-first:
#
#   1. Large drivability insurance NOW (tiny budget, all 4 stages of
#      run_large.sh; VERDICT #2) — stage 1 of the WavLM recipe was
#      paused via its clean SIGTERM checkpoint, so the chip is free;
#   2. resume WavLM stage 1 to its FULL published 50k budget (the joint
#      distill+prune stage is the scientifically meaningful one);
#   3. prune (surgery) + stage 2 with whatever time remains under
#      $STAGE2_DEADLINE — a deadline stop still yields distilled.pth via
#      tools/export_from_ckpt.py (truncation step documented);
#   4. save_final_ckpt + reload + artifacts + stall analyses.
set -uo pipefail
cd /root/repo

LOG=_run_data/wavlm_run_r5.log       # stage-1 log continues here
EXP=_run_data/exp_wavlm_r5
ROUND_END=${ROUND_END:-1787120281}   # 06:18 UTC
STAGE2_DEADLINE=$((ROUND_END - 4300))
phase() { echo "[night] $(date -Is) $*"; }

phase "1. Large drivability insurance (all 4 stages, tiny budget)"
TSV_DIR=_run_data/tsv TRAIN_SUBSET=train100 \
TEACHER_CKPT=_run_data/pretrained/wav2vec2-large-synth.pth \
EXP_DIR=_run_data/exp_large_r5b \
MAX_UPDATES=200 WARMUP_UPDATES=60 SPARSITY_WARMUP_UPDATES=60 \
FINAL_MAX_UPDATES=100 FINAL_WARMUP_UPDATES=20 \
SECONDS_PER_BATCH=180 \
DPHUBERT_DEADLINE_TS=$((ROUND_END - 3600)) \
bash run_large.sh > _run_data/large_run_r5b.log 2>&1
rcL=$?
tail -3 _run_data/large_run_r5b.log
[ $rcL -ne 0 ] && phase "LARGE INSURANCE FAILED rc=$rcL (continuing)"
python tools/collect_recipe_artifacts.py --exp _run_data/exp_large_r5b \
  --log _run_data/large_run_r5b.log --out docs/large_recipe_r5 \
  && phase "large artifacts -> docs/large_recipe_r5"

phase "2. resume WavLM stage 1 to 50k"
while :; do
  python -m dphubert_tpu.cli.distill \
    --tsv_dir _run_data/tsv --train_subset train100 \
    --seconds_per_batch 160 \
    --exp_dir "$EXP/stage1" \
    --teacher_ckpt _run_data/pretrained/wavlm-base-synth.pth \
    --student_ckpt _run_data/pretrained/wavlm-base-synth.pth \
    --distill_layers 0.4,8,12 --distill_mode layer2layer \
    --l2_weight 0 --l1_weight 1 --cos_weight 1 --cos_type raw \
    --learning_rate 0.0002 --warmup_updates 15000 \
    --max_updates 50000 --clip_norm 10 \
    --pruning_units conv,head,interm --reg_learning_rate 0.02 \
    --target_sparsity 0.75 --sparsity_warmup_updates 5000 \
    --ckpt_backend orbax --num_shapes 12 \
    --log_interval 50 --ckpt_interval 1000 \
    --precision bf16 --rng_impl rbg \
    --steps_per_dispatch 4 \
    --resume_checkpoint "$EXP/stage1/ckpts/orbax" 2>&1 | tee -a "$LOG"
  rc=${PIPESTATUS[0]}
  [ "$rc" -eq 75 ] || break
  phase "stage 1 preempted, resuming"
done
phase "stage 1 rc=$rc"
if [ "$rc" -ne 0 ]; then
  if [ ! -f "$EXP/stage1/ckpts/distilled.pth" ]; then
    phase "stage 1 truncated — exporting gated student from checkpoint"
    python tools/export_from_ckpt.py \
      --student_ckpt _run_data/pretrained/wavlm-base-synth.pth \
      --ckpt "$EXP/stage1/ckpts/orbax" --rng_impl rbg --use_reg \
      --distill_layers 0.4,8,12 \
      --out "$EXP/stage1/ckpts/distilled.pth" || { phase "EXPORT1 FAILED"; exit 4; }
  fi
fi

phase "2.5 prune (mask surgery)"
python -m dphubert_tpu.cli.prune \
  --distilled_ckpt "$EXP/stage1/ckpts/distilled.pth" \
  --original_ckpt _run_data/pretrained/wavlm-base-synth.pth 2>&1 | tee -a "$LOG"
ls -la "$EXP/stage1/ckpts/pruned_hubert_base.pth" || { phase "PRUNE FAILED"; exit 3; }

phase "3. stage 2 (final_distill), deadline $(date -d @$STAGE2_DEADLINE -Is)"
export DPHUBERT_DEADLINE_TS=$STAGE2_DEADLINE
attempt=0
while :; do
  resume_args=()
  [ $attempt -gt 0 ] && resume_args=(--resume_checkpoint "$EXP/stage2/ckpts/orbax")
  python -m dphubert_tpu.cli.final_distill \
    --tsv_dir _run_data/tsv --train_subset train100 \
    --seconds_per_batch 160 \
    --exp_dir "$EXP/stage2" \
    --teacher_ckpt _run_data/pretrained/wavlm-base-synth.pth \
    --student_ckpt "$EXP/stage1/ckpts/pruned_hubert_base.pth" \
    --distill_layers 0.4,8,12 --distill_mode layer2layer \
    --l2_weight 0 --l1_weight 1 --cos_weight 1 --cos_type raw \
    --learning_rate 0.0001 --warmup_updates 5000 \
    --max_updates 25000 --clip_norm 10 \
    --ckpt_backend orbax --num_shapes 12 \
    --log_interval 50 --ckpt_interval 1000 \
    --precision bf16 --rng_impl rbg \
    --steps_per_dispatch 4 \
    "${resume_args[@]}" 2>&1 | tee -a "$EXP/stage2.log"
  rc=${PIPESTATUS[0]}
  [ "$rc" -eq 75 ] || break
  attempt=$((attempt + 1))
  phase "stage 2 preempted, resuming (attempt $attempt)"
done
phase "stage 2 rc=$rc"

if [ ! -f "$EXP/stage2/ckpts/distilled.pth" ] && [ -d "$EXP/stage2/ckpts/orbax" ]; then
  phase "stage 2 truncated — exporting from the training checkpoint"
  python tools/export_from_ckpt.py \
    --student_ckpt "$EXP/stage1/ckpts/pruned_hubert_base.pth" \
    --ckpt "$EXP/stage2/ckpts/orbax" --rng_impl rbg \
    --distill_layers 0.4,8,12 \
    --out "$EXP/stage2/ckpts/distilled.pth" || phase "EXPORT2 FAILED"
fi

if [ -f "$EXP/stage2/ckpts/distilled.pth" ]; then
  phase "4. save_final_ckpt + reload"
  python -m dphubert_tpu.cli.save_final_ckpt \
    --config_path "$EXP/stage1/ckpts/pruned_hubert_base.pth" \
    --ckpt_after_final_distill "$EXP/stage2/ckpts/distilled.pth" \
    --out "$EXP/dpwavlm.pth" \
    && python -m dphubert_tpu.cli.load_dpmodel "$EXP/dpwavlm.pth"
  phase "stage 3 rc=$?"
fi

phase "artifacts + stall analyses"
python tools/collect_recipe_artifacts.py --exp "$EXP" \
  --log "$LOG" --out docs/full_recipe_wavlm
python tools/analyze_ckpt_stall.py "$EXP/stage1/metrics.jsonl" \
  --ckpt_interval 1000 --dispatch 4 > docs/ckpt_stall_wavlm_r5.json
cat docs/ckpt_stall_wavlm_r5.json
if [ -f "$EXP/stage2/metrics.jsonl" ]; then
  python tools/analyze_ckpt_stall.py "$EXP/stage2/metrics.jsonl" \
    --ckpt_interval 1000 --dispatch 4 > docs/ckpt_stall_wavlm_r5_stage2.json
  cat docs/ckpt_stall_wavlm_r5_stage2.json
fi
phase "night done"
