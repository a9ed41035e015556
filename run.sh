#!/bin/bash
# Full compression recipe: HuBERT Base -> DPHuBERT at sparsity 0.75.
#
# TPU-native counterpart of the reference pipeline driver (reference
# run.sh:45-115): same four stages and hyperparameters; data parallelism
# comes from the jit-sharded device mesh instead of SLURM+DDP ranks, so one
# process drives all local chips.  For multi-host TPU slices, launch this
# script once per host (jax.distributed initializes from the TPU runtime).
set -euo pipefail

# ---- hyperparameters (the recipe record, reference run.sh:16-42) ----
tsv_dir=${TSV_DIR:-data/librispeech}          # prepared by cli.prepare_data
train_subset=${TRAIN_SUBSET:-train960}
teacher_ckpt=${TEACHER_CKPT:-pretrained/hubert-base-ls960.hf.pth}
student_ckpt=${STUDENT_CKPT:-$teacher_ckpt}
distill_layers=${DISTILL_LAYERS:-"0.4,8,12"}
distill_mode="layer2layer"
l2_weight=0; l1_weight=1; cos_weight=1; cos_type="raw"

learning_rate=0.0002
warmup_updates=${WARMUP_UPDATES:-15000}
max_updates=${MAX_UPDATES:-50000}
seconds_per_batch=${SECONDS_PER_BATCH:-160}   # per chip
clip_norm=10

# TPU runtime knobs (not part of the published recipe)
ckpt_backend=${CKPT_BACKEND:-orbax}           # async rotated ckpts + background device->host gather; npz = last-only
rng_impl=${RNG_IMPL:-rbg}                     # TPU hardware PRNG: 6% faster steps (r4 profile); see --rng_impl help for the cross-upgrade bit-stability caveat
steps_per_dispatch=${STEPS_PER_DISPATCH:-4}   # K batches per jitted dispatch: ~13% faster steps (r4 CLI A/B)
num_shapes=${NUM_SHAPES:-12}                  # static length-bucket ladder
log_interval=${LOG_INTERVAL:-50}
ckpt_interval=${CKPT_INTERVAL:-1000}

# Large-family knobs: the 24-layer unrolled backward exceeds the
# compile-server whole-graph limits — run_large.sh sets both to 1
# (bench.py:84-92: Large only compiles with remat + scan_layers).
extra_flags=()
[ "${REMAT:-0}" = 1 ] && extra_flags+=(--remat)
[ "${SCAN_LAYERS:-0}" = 1 ] && extra_flags+=(--scan_layers)

pruning_units="conv,head,interm"
reg_learning_rate=0.02
target_sparsity=${TARGET_SPARSITY:-0.75}
# overridable so scaled-budget validation runs (reduced MAX_UPDATES) can
# keep the warmup a proportional fraction of the schedule
sparsity_warmup_updates=${SPARSITY_WARMUP_UPDATES:-5000}

final_learning_rate=0.0001
final_warmup_updates=${FINAL_WARMUP_UPDATES:-5000}
final_max_updates=${FINAL_MAX_UPDATES:-25000}

root_dir=${EXP_DIR:-exp/hubert-base_sp${target_sparsity}}
mkdir -p "$root_dir"

# A preempted stage (SIGTERM, or the trainer's RSS watchdog converting an
# impending OOM kill into a clean checkpoint) exits 75: resume it from its
# own checkpoint until it completes; any other failure aborts.
# $resume_from must match the stage's --ckpt_backend: last.npz for npz,
# the ckpts/orbax directory for orbax (the trainer restores the latest
# step from a directory path).
resume_path() {  # $1 = stage dir
  if [ "$ckpt_backend" = orbax ]; then
    echo "$1/ckpts/orbax"
  else
    echo "$1/ckpts/last.npz"
  fi
}

retry_resumable() {
  local attempt=0 rc resume_args
  while :; do
    resume_args=()
    [ $attempt -gt 0 ] && resume_args=(--resume_checkpoint "$resume_from")
    "$@" "${resume_args[@]}"
    rc=${PIPESTATUS[0]:-$?}
    [ "$rc" -eq 0 ] && return 0
    [ "$rc" -ne 75 ] && return "$rc"
    attempt=$((attempt + 1))
    echo "[run.sh] $(date -Is) stage preempted (exit 75), resuming (attempt $attempt)"
  done
}

echo "[run.sh] $(date -Is) stage 1 (distill) start"
# ---- stage 1: joint distillation + structured pruning ----
resume_from=$(resume_path "$root_dir/stage1")
retry_resumable python -m dphubert_tpu.cli.distill \
  --tsv_dir "$tsv_dir" --train_subset "$train_subset" \
  --seconds_per_batch "$seconds_per_batch" \
  --exp_dir "$root_dir/stage1" \
  --teacher_ckpt "$teacher_ckpt" --student_ckpt "$student_ckpt" \
  --distill_layers "$distill_layers" --distill_mode "$distill_mode" \
  --l2_weight "$l2_weight" --l1_weight "$l1_weight" \
  --cos_weight "$cos_weight" --cos_type "$cos_type" \
  --learning_rate "$learning_rate" --warmup_updates "$warmup_updates" \
  --max_updates "$max_updates" --clip_norm "$clip_norm" \
  --pruning_units "$pruning_units" --reg_learning_rate "$reg_learning_rate" \
  --target_sparsity "$target_sparsity" \
  --sparsity_warmup_updates "$sparsity_warmup_updates" \
  --ckpt_backend "$ckpt_backend" --num_shapes "$num_shapes" \
  --log_interval "$log_interval" --ckpt_interval "$ckpt_interval" \
  --precision bf16 --rng_impl "$rng_impl" \
  --steps_per_dispatch "$steps_per_dispatch" \
  ${extra_flags[@]+"${extra_flags[@]}"} 2>&1 | tee -a "$root_dir/stage1.log" || exit 1

echo "[run.sh] $(date -Is) stage 1.5 (prune) start"
# ---- stage 1.5: mask surgery ----
python -m dphubert_tpu.cli.prune \
  --distilled_ckpt "$root_dir/stage1/ckpts/distilled.pth" \
  --original_ckpt "$teacher_ckpt"

echo "[run.sh] $(date -Is) stage 2 (final_distill) start"
# ---- stage 2: final distillation of the pruned student ----
resume_from=$(resume_path "$root_dir/stage2")
retry_resumable python -m dphubert_tpu.cli.final_distill \
  --tsv_dir "$tsv_dir" --train_subset "$train_subset" \
  --seconds_per_batch "$seconds_per_batch" \
  --exp_dir "$root_dir/stage2" \
  --teacher_ckpt "$teacher_ckpt" \
  --student_ckpt "$root_dir/stage1/ckpts/pruned_hubert_base.pth" \
  --distill_layers "$distill_layers" --distill_mode "$distill_mode" \
  --l2_weight "$l2_weight" --l1_weight "$l1_weight" \
  --cos_weight "$cos_weight" --cos_type "$cos_type" \
  --learning_rate "$final_learning_rate" \
  --warmup_updates "$final_warmup_updates" \
  --max_updates "$final_max_updates" --clip_norm "$clip_norm" \
  --ckpt_backend "$ckpt_backend" --num_shapes "$num_shapes" \
  --log_interval "$log_interval" --ckpt_interval "$ckpt_interval" \
  --precision bf16 --rng_impl "$rng_impl" \
  --steps_per_dispatch "$steps_per_dispatch" \
  ${extra_flags[@]+"${extra_flags[@]}"} 2>&1 | tee -a "$root_dir/stage2.log" || exit 1

echo "[run.sh] $(date -Is) stage 3 (save_final_ckpt) start"
# ---- stage 3: merge + export the portable checkpoint ----
python -m dphubert_tpu.cli.save_final_ckpt \
  --config_path "$root_dir/stage1/ckpts/pruned_hubert_base.pth" \
  --ckpt_after_final_distill "$root_dir/stage2/ckpts/distilled.pth" \
  --out "$root_dir/dphubert.pth"

python -m dphubert_tpu.cli.load_dpmodel "$root_dir/dphubert.pth"
echo "[run.sh] $(date -Is) done"
echo "Done: $root_dir/dphubert.pth"
