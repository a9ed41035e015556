#!/bin/bash
# Round-5 night takeover: reallocates the chip after WavLM stage 1.
#
# Ambient tunnel load halved the stage-1 step rate, so the chain's fixed
# sequence (stage 2 full 25k -> benches -> Large) would deadline-stop
# stage 2 WITHOUT an export and never reach the Large insurance run.
# This script intercepts at the stage-1/prune boundary and reorders:
#
#   1. wait for run.sh's "stage 1.5 (prune) start" marker, then stop the
#      CHAIN/run.sh bash wrappers only (the prune python finishes as an
#      orphan — never kill a python mid-TPU-claim);
#   2. Large drivability insurance via run_large.sh (tiny budget, all 4
#      stages; VERDICT #2) — skipped if it's already past $T_LARGE_SKIP;
#   3. stage 2 (final_distill) with ALL remaining time and a deadline
#      that leaves room for export: a deadline stop (exit 76) still
#      yields distilled.pth via tools/export_from_ckpt.py (stage-2 step
#      count documented; the architecture/params are fixed at surgery);
#   4. save_final_ckpt + load_dpmodel + artifact collection + the
#      checkpoint-stall analysis.
set -uo pipefail
cd /root/repo

LOG=_run_data/wavlm_run_r5.log
EXP=_run_data/exp_wavlm_r5
ROUND_END=${ROUND_END:-1787120281}               # 06:18 UTC
STAGE2_DEADLINE=$((ROUND_END - 4400))            # ~05:04 UTC
T_LARGE_SKIP=$((ROUND_END - 8100))               # ~04:03 UTC

phase() { echo "[takeover] $(date -Is) $*"; }

phase "waiting for stage-1 completion (prune marker in $LOG)"
while ! grep -q "stage 1.5 (prune) start" "$LOG" 2>/dev/null; do
  if grep -q "exiting 76" "$LOG" 2>/dev/null; then
    phase "stage 1 deadline-stopped before completion — manual fallback needed"
    exit 2
  fi
  sleep 60
done
phase "stage 1 complete; prune started"

# stop the orchestration wrappers (bash only; pruning python is CPU-side
# and finishes as an orphan)
for pid in 2120 3173 3177; do
  if grep -qa "r5_chip_chain3\|run.sh" "/proc/$pid/cmdline" 2>/dev/null; then
    kill "$pid" 2>/dev/null && phase "stopped wrapper pid $pid"
  fi
done

phase "waiting for prune to finish (strict-reload marker)"
for i in $(seq 1 60); do
  grep -q "Successfully saved pruned model" "$LOG" 2>/dev/null && break
  sleep 30
done
ls -la "$EXP/stage1/ckpts/pruned_hubert_base.pth" || { phase "PRUNE FAILED"; exit 3; }

if [ "$(date +%s)" -lt "$T_LARGE_SKIP" ]; then
  phase "Large drivability insurance (tiny budget, all 4 stages)"
  TSV_DIR=_run_data/tsv TRAIN_SUBSET=train100 \
  TEACHER_CKPT=_run_data/pretrained/wav2vec2-large-synth.pth \
  EXP_DIR=_run_data/exp_large_r5b \
  MAX_UPDATES=400 WARMUP_UPDATES=120 SPARSITY_WARMUP_UPDATES=120 \
  FINAL_MAX_UPDATES=200 FINAL_WARMUP_UPDATES=40 \
  SECONDS_PER_BATCH=180 \
  DPHUBERT_DEADLINE_TS=$STAGE2_DEADLINE \
  bash run_large.sh > _run_data/large_run_r5b.log 2>&1
  rcL=$?
  tail -3 _run_data/large_run_r5b.log
  [ $rcL -ne 0 ] && phase "LARGE INSURANCE FAILED rc=$rcL (continuing)"
  python tools/collect_recipe_artifacts.py --exp _run_data/exp_large_r5b \
    --log _run_data/large_run_r5b.log --out docs/large_recipe_r5 \
    && phase "large artifacts -> docs/large_recipe_r5"
else
  phase "SKIPPING Large insurance (past $(date -d @$T_LARGE_SKIP -Is))"
fi

phase "stage 2 (final_distill) with deadline $(date -d @$STAGE2_DEADLINE -Is)"
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

if [ ! -f "$EXP/stage2/ckpts/distilled.pth" ]; then
  phase "stage 2 truncated — exporting from the training checkpoint"
  python tools/export_from_ckpt.py \
    --student_ckpt "$EXP/stage1/ckpts/pruned_hubert_base.pth" \
    --ckpt "$EXP/stage2/ckpts/orbax" --rng_impl rbg \
    --distill_layers 0.4,8,12 \
    --out "$EXP/stage2/ckpts/distilled.pth" || { phase "EXPORT FAILED"; exit 4; }
fi

phase "stage 3: save_final_ckpt + reload"
python -m dphubert_tpu.cli.save_final_ckpt \
  --config_path "$EXP/stage1/ckpts/pruned_hubert_base.pth" \
  --ckpt_after_final_distill "$EXP/stage2/ckpts/distilled.pth" \
  --out "$EXP/dpwavlm.pth" \
  && python -m dphubert_tpu.cli.load_dpmodel "$EXP/dpwavlm.pth"
rc3=$?
[ $rc3 -ne 0 ] && phase "STAGE 3 FAILED rc=$rc3"

phase "artifacts + stall analysis"
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
phase "takeover done"
