#!/bin/bash
# Round-5 final chip chain (v4 — replaces r5_night.sh, which never ran:
# the host rebooted and wiped _run_data before the orchestrator started).
#
# Serialized single-chip plan, most-valuable-first, with git commits after
# each phase so artifacts survive the session ending mid-chain:
#
#   0. wait for the background corpus/teacher regeneration to finish;
#   1. Large drivability proof (VERDICT r4 next #2): all 4 stages of
#      run_large.sh at a tiny budget -> docs/large_recipe_r5;
#   2. DPWavLM recipe at published hyperparameters (VERDICT #3), stage 1
#      deadline-bounded, truncation handled via export_from_ckpt, then
#      prune -> stage 2 (deadline-bounded) -> save_final -> reload
#      -> docs/full_recipe_wavlm_r5;
#   3. checkpoint-stall analyses (VERDICT #1 measurement: background
#      device->host gather keeps the crossing-window step rate near the
#      clean rate) + bench captures if time remains.
set -uo pipefail
cd /root/repo

ROUND_END=${ROUND_END:-1787120281}            # 06:18 UTC
LARGE_DEADLINE=$((ROUND_END - 5400))          # hard stop for phase 1
STAGE1_DEADLINE=$((ROUND_END - 3300))
STAGE2_DEADLINE=$((ROUND_END - 2300))
CHAIN_END=$((ROUND_END - 1500))               # leave the chip free for the driver's bench
EXP=_run_data/exp_wavlm_r5
LOG=_run_data/wavlm_run_r5.log

phase() { echo "[final] $(date -Is) $*"; }
commit_docs() {  # $1 = message; commits docs/ + any tracked-file changes
  git add docs >/dev/null 2>&1
  git commit -q -m "$1" >/dev/null 2>&1 && phase "committed: $1" || phase "nothing to commit for: $1"
}

phase "0. waiting for data/teacher setup"
for i in $(seq 1 720); do
  grep -q 'DONE' _run_data/setup.log 2>/dev/null && break
  sleep 5
done
grep -q 'DONE' _run_data/setup.log || { phase "SETUP NEVER FINISHED"; tail -5 _run_data/setup.log; exit 2; }
tail -1 _run_data/setup.log

phase "0.5 device_snapshot donation-safety check (TPU)"
timeout 600 python - <<'EOF'
import jax, numpy as np, jax.numpy as jnp
print("backend:", jax.default_backend())
from dphubert_tpu import wav2vec2_model
from dphubert_tpu.train.checkpointing import device_snapshot
from dphubert_tpu.train.distill_module import DistillConfig, init_train_state
from tests.test_forward_parity import _tiny_w2v2_config

cfg = _tiny_w2v2_config()
student = wav2vec2_model(**cfg)
dcfg = DistillConfig(use_reg=False, distill_layer_groups=((0,), (1, 3)))
state, _ = init_train_state(student=student,
                            student_params=student.init(jax.random.key(0)),
                            cfg=dcfg, teacher_embed_dim=64,
                            rng=jax.random.key(1))
before = [np.array(x) for x in jax.tree.leaves(
    state._replace(rng=jax.random.key_data(state.rng)))]
snap = device_snapshot(state)
bump = jax.jit(lambda t: jax.tree.map(
    lambda a: a + jnp.ones((), a.dtype) if jnp.issubdtype(a.dtype, jnp.number) else a, t),
    donate_argnums=0)
mutated = bump(state._replace(rng=jax.random.key_data(state.rng)))
jax.block_until_ready(mutated)
after = [np.array(x) for x in jax.tree.leaves(snap)]
for a, b in zip(before, after):
    np.testing.assert_array_equal(a, b)
print("OK: snapshot survived donation on", jax.default_backend(),
      f"({len(after)} leaves bitwise-equal)")
EOF
rc0=$?
[ $rc0 -ne 0 ] && phase "SNAPSHOT CHECK FAILED rc=$rc0 (continuing — background saver degrades to sync)"

phase "1. Large drivability proof (all 4 stages, tiny budget), deadline $(date -d @$LARGE_DEADLINE -Is)"
TSV_DIR=_run_data/tsv TRAIN_SUBSET=train100 \
TEACHER_CKPT=_run_data/pretrained/wav2vec2-large-synth.pth \
EXP_DIR=_run_data/exp_large_r5 \
MAX_UPDATES=200 WARMUP_UPDATES=60 SPARSITY_WARMUP_UPDATES=60 \
FINAL_MAX_UPDATES=100 FINAL_WARMUP_UPDATES=20 \
SECONDS_PER_BATCH=180 CKPT_INTERVAL=100 \
DPHUBERT_DEADLINE_TS=$LARGE_DEADLINE \
bash run_large.sh > _run_data/large_run_r5.log 2>&1
rcL=$?
tail -3 _run_data/large_run_r5.log
[ $rcL -ne 0 ] && phase "LARGE RUN rc=$rcL (collecting whatever exists)"
python tools/collect_recipe_artifacts.py --exp _run_data/exp_large_r5 \
  --log _run_data/large_run_r5.log --out docs/large_recipe_r5 \
  && phase "large artifacts -> docs/large_recipe_r5"
commit_docs "Large recipe driven end-to-end on-chip (run_large.sh, tiny budget): docs/large_recipe_r5"

phase "2. DPWavLM stage 1 (published hyperparameters, 50k budget), deadline $(date -d @$STAGE1_DEADLINE -Is)"
export DPHUBERT_DEADLINE_TS=$STAGE1_DEADLINE
attempt=0
while :; do
  resume_args=()
  [ $attempt -gt 0 ] && resume_args=(--resume_checkpoint "$EXP/stage1/ckpts/orbax")
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
    "${resume_args[@]}" 2>&1 | tee -a "$LOG"
  rc=${PIPESTATUS[0]}
  [ "$rc" -eq 75 ] || break
  attempt=$((attempt + 1))
  phase "stage 1 preempted, resuming (attempt $attempt)"
done
phase "stage 1 rc=$rc"
if [ ! -f "$EXP/stage1/ckpts/distilled.pth" ]; then
  phase "stage 1 truncated — exporting gated student from checkpoint"
  python tools/export_from_ckpt.py \
    --student_ckpt _run_data/pretrained/wavlm-base-synth.pth \
    --ckpt "$EXP/stage1/ckpts/orbax" --rng_impl rbg --use_reg \
    --distill_layers 0.4,8,12 \
    --out "$EXP/stage1/ckpts/distilled.pth" || { phase "EXPORT1 FAILED"; exit 4; }
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
  --log "$LOG" --out docs/full_recipe_wavlm_r5
python tools/analyze_ckpt_stall.py "$EXP/stage1/metrics.jsonl" \
  --ckpt_interval 1000 --dispatch 4 > docs/full_recipe_wavlm_r5/ckpt_stall_stage1.json \
  && cat docs/full_recipe_wavlm_r5/ckpt_stall_stage1.json
if [ -f "$EXP/stage2/metrics.jsonl" ]; then
  python tools/analyze_ckpt_stall.py "$EXP/stage2/metrics.jsonl" \
    --ckpt_interval 1000 --dispatch 4 > docs/full_recipe_wavlm_r5/ckpt_stall_stage2.json \
    && cat docs/full_recipe_wavlm_r5/ckpt_stall_stage2.json
fi
commit_docs "DPWavLM recipe on-chip (published hyperparameters, deadline-bounded): docs/full_recipe_wavlm_r5 + ckpt-stall measurements"

if [ "$(date +%s)" -lt $((CHAIN_END - 600)) ]; then
  phase "5. bench captures -> docs/bench_r5"
  mkdir -p docs/bench_r5
  for mode in hubert_base wav2vec2_large pruned_inference; do
    [ "$(date +%s)" -ge $((CHAIN_END - 120)) ] && break
    phase "5. bench $mode"
    DPHUBERT_BENCH_MODEL=$mode timeout 900 python bench.py \
      > docs/bench_r5/$mode.json 2>/tmp/bench_r5_$mode.err || \
      { echo "[final] bench $mode FAILED"; tail -5 /tmp/bench_r5_$mode.err; rm -f docs/bench_r5/$mode.json; }
    cat docs/bench_r5/$mode.json 2>/dev/null
  done
  commit_docs "r5 bench captures (sustained-median, device-resident batch): docs/bench_r5"
fi
phase "chain done"
