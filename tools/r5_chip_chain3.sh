#!/bin/bash
# Round-5 chip chain v3 — reordered from v2 so the WavLM full-budget
# recipe (the only VERDICT r4 "missing" item still open) gets the chip
# immediately after kernel validation; everything else is adaptive to the
# time that remains.  Phases:
#
#   gate. claim loop — each probe rides the axon client's internal ~25 min
#         retry window; loop until a claim lands.
#   A. snapshot donation-safety + library drive + WavLM single-KV
#      fast-path kernel compile checks (masked + dropout, fwd + bwd) in
#      ONE process; on kernel failure the chain exports
#      DPHUBERT_WAVLM_SINGLE_BLOCK=0 so later phases fall back to the
#      proven general path.  Then the WavLM train-step bench
#      (integration compile) -> docs/bench_r5/wavlm.json.
#   C. WavLM full 50k+25k recipe through run.sh
#      -> _run_data/exp_wavlm_r5 (VERDICT r4 missing #3: sparsity ~0.75,
#      ~23.6M student, strict reload).  Its own stage-1 metrics.jsonl is
#      the background-gather stall evidence (VERDICT next #1 "<5 s"):
#      analyzed to docs/ckpt_stall_wavlm_r5.json right after.
#   D. bench captures -> docs/bench_r5 (hubert_base, wav2vec2_large,
#      pruned_inference) if time remains.
#   E. Large scaled-budget pipeline through run_large.sh with a budget
#      picked from the time left (VERDICT #2 asks only that reduced
#      MAX_UPDATES completes all 4 stages on-chip).
#
# Every trainer stage checkpoints and exits 76 at DPHUBERT_DEADLINE_TS,
# so an overrunning recipe ends cleanly before the round-end driver
# bench needs the chip.
set -uo pipefail
cd /root/repo
echo $$ > /tmp/r5_chain3.pid

DEADLINE_TS=${DEADLINE_TS:-$(date -d '21:45' +%s)}
export DPHUBERT_DEADLINE_TS=$DEADLINE_TS

phase() { echo "[chain3] $(date -Is) $*"; }
left_min() { echo $(( (DEADLINE_TS - $(date +%s)) / 60 )); }

phase "gate: waiting for a chip claim ($(left_min) min to deadline)"
claimed=0
for i in $(seq 1 40); do
  if python -c "import jax; print('claimed:', jax.devices())"; then
    claimed=1; break
  fi
  phase "gate attempt $i failed; sleeping 60s"
  sleep 60
done
if [ "$claimed" -ne 1 ]; then
  phase "GATE FAILED — chip never became claimable; aborting chain"
  exit 1
fi
phase "gate passed ($(left_min) min left)"

phase "A. snapshot-donation check + library drive + kernel compile checks"
python - <<'EOF'
import numpy as np, jax, jax.numpy as jnp
print("backend:", jax.default_backend())

# --- A1: device_snapshot survives buffer donation (background ckpt gather)
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
print("A1 OK: snapshot survived donation (%d leaves bitwise-equal)" % len(after))

# --- A2: library drive (verify-skill surface)
import dphubert_tpu as dp
model = dp.hubert_base()
params = model.init(jax.random.key(0))
wave = np.random.default_rng(0).standard_normal((2, 32000)).astype(np.float32)
outs, lens = model.extract_features(params, wave)
assert len(outs) == 13, len(outs)
logits, ls = model.forward(params, wave, np.array([32000, 24000]))
print("A2 OK: extract_features 13 states", outs[-1].shape, "forward", logits.shape)
EOF
rcA=$?
[ $rcA -ne 0 ] && phase "PHASE A FAILED rc=$rcA (continuing)"

phase "A3. WavLM single-KV fast-path Mosaic compile check (fwd+bwd, masked, dropout)"
python - <<'EOF'
import numpy as np, jax, jax.numpy as jnp
from dphubert_tpu.ops.wavlm_attention import wavlm_flash_attention
B, H, L, D = 4, 12, 768, 64
rng = np.random.default_rng(1)
q, k, v = (jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
           for _ in range(3))
bias = jnp.asarray(rng.standard_normal((H, L, L)), jnp.float32)
gate = jnp.asarray(rng.standard_normal((B, H, L)), jnp.float32)
lengths = jnp.asarray([768, 700, 512, 640], jnp.int32)

def loss(q, k, v, bias, gate, rate, key):
    o = wavlm_flash_attention(q, k, v, bias, gate, lengths,
                              dropout_rate=rate, dropout_rng=key)
    return jnp.sum(o.astype(jnp.float32) ** 2)

for rate in (0.0, 0.1):
    key = jax.random.key(3) if rate else None
    val, grads = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4)),
                         static_argnums=5)(q, k, v, bias, gate, rate, key)
    total = float(val) + sum(float(jnp.sum(jnp.abs(g))) for g in grads)
    assert np.isfinite(total), (rate, total)
    print(f"A3 OK: fast-path fwd+bwd compiled+ran on TPU, masked, dropout={rate}")
EOF
rcA3=$?
if [ $rcA3 -ne 0 ]; then
  phase "A3 FAILED rc=$rcA3 — disabling the single-KV fast path for the rest of the chain"
  export DPHUBERT_WAVLM_SINGLE_BLOCK=0
fi

phase "A4. WavLM train-step bench (integration compile + docs/bench_r5)"
mkdir -p docs/bench_r5
DPHUBERT_BENCH_MODEL=wavlm python bench.py > /tmp/bench_wavlm_r5.json 2>/tmp/bench_wavlm_r5.err
rc=$?
cat /tmp/bench_wavlm_r5.json
if [ $rc -eq 0 ]; then
  cp /tmp/bench_wavlm_r5.json docs/bench_r5/wavlm.json
else
  phase "A4 WAVLM BENCH FAILED (rc=$rc) — tail of stderr:"; tail -30 /tmp/bench_wavlm_r5.err
  if [ "${DPHUBERT_WAVLM_SINGLE_BLOCK:-1}" != "0" ]; then
    phase "A4 retry with the fast path disabled"
    export DPHUBERT_WAVLM_SINGLE_BLOCK=0
    DPHUBERT_BENCH_MODEL=wavlm python bench.py > /tmp/bench_wavlm_r5.json 2>/tmp/bench_wavlm_r5.err \
      && cp /tmp/bench_wavlm_r5.json docs/bench_r5/wavlm.json && cat /tmp/bench_wavlm_r5.json
  fi
fi

phase "B. Large drivability insurance (tiny budget, all 4 stages)"
# VERDICT missing #2 only requires that run_large.sh with reduced
# MAX_UPDATES completes all 4 stages on-chip; secure that cheaply BEFORE
# the ~5 h WavLM recipe so a deadline-stop there cannot take Large down
# with it.  A bigger-budget re-run (phase E) upgrades the artifacts if
# time remains.
TSV_DIR=_run_data/tsv TRAIN_SUBSET=train100 \
TEACHER_CKPT=_run_data/pretrained/wav2vec2-large-synth.pth \
EXP_DIR=_run_data/exp_large_r5 \
MAX_UPDATES=400 WARMUP_UPDATES=120 SPARSITY_WARMUP_UPDATES=120 \
FINAL_MAX_UPDATES=200 FINAL_WARMUP_UPDATES=40 \
SECONDS_PER_BATCH=180 \
bash run_large.sh > _run_data/large_run_r5.log 2>&1
rcB=$?
tail -3 _run_data/large_run_r5.log
[ $rcB -ne 0 ] && phase "PHASE B (large insurance) FAILED rc=$rcB (continuing)"
python tools/collect_recipe_artifacts.py --exp _run_data/exp_large_r5 \
  --log _run_data/large_run_r5.log --out docs/large_recipe_r5 \
  && phase "B artifacts -> docs/large_recipe_r5"

phase "C. WavLM full recipe 50k+25k ($(left_min) min left)"
TSV_DIR=_run_data/tsv TRAIN_SUBSET=train100 \
TEACHER_CKPT=_run_data/pretrained/wavlm-base-synth.pth \
EXP_DIR=_run_data/exp_wavlm_r5 \
bash run.sh > _run_data/wavlm_run_r5.log 2>&1
rcC=$?
tail -3 _run_data/wavlm_run_r5.log
[ $rcC -ne 0 ] && phase "PHASE C (wavlm recipe) FAILED rc=$rcC (continuing)"
python tools/collect_recipe_artifacts.py --exp _run_data/exp_wavlm_r5 \
  --log _run_data/wavlm_run_r5.log --out docs/full_recipe_wavlm \
  && phase "C artifacts -> docs/full_recipe_wavlm"
if [ -f _run_data/exp_wavlm_r5/stage1/metrics.jsonl ]; then
  python tools/analyze_ckpt_stall.py _run_data/exp_wavlm_r5/stage1/metrics.jsonl \
    --ckpt_interval 1000 --dispatch 4 > docs/ckpt_stall_wavlm_r5.json \
    && cat docs/ckpt_stall_wavlm_r5.json
fi

if [ "$(left_min)" -gt 15 ]; then
  phase "D. bench captures -> docs/bench_r5 ($(left_min) min left)"
  for mode in hubert_base wav2vec2_large pruned_inference; do
    if [ "$(left_min)" -lt 8 ]; then phase "D stopped at $mode (deadline)"; break; fi
    phase "D. bench $mode"
    DPHUBERT_BENCH_MODEL=$mode python bench.py \
      > docs/bench_r5/$mode.json 2>/tmp/bench_r5_$mode.err || \
      { phase "bench $mode FAILED"; tail -5 /tmp/bench_r5_$mode.err; rm -f docs/bench_r5/$mode.json; }
    cat docs/bench_r5/$mode.json 2>/dev/null
  done
else
  phase "D SKIPPED (deadline)"
fi

lm=$(left_min)
if [ "$lm" -gt 85 ]; then BUD=2500
elif [ "$lm" -gt 45 ]; then BUD=1000
elif [ "$lm" -gt 25 ]; then BUD=500
else BUD=0; fi
if [ "$BUD" -gt 400 ]; then
  phase "E. Large scaled-budget re-run (MAX_UPDATES=$BUD, $lm min left)"
  TSV_DIR=_run_data/tsv TRAIN_SUBSET=train100 \
  TEACHER_CKPT=_run_data/pretrained/wav2vec2-large-synth.pth \
  EXP_DIR=_run_data/exp_large_r5_scaled \
  MAX_UPDATES=$BUD WARMUP_UPDATES=$((BUD * 3 / 10)) \
  SPARSITY_WARMUP_UPDATES=$((BUD * 3 / 10)) \
  FINAL_MAX_UPDATES=$((BUD / 2)) FINAL_WARMUP_UPDATES=$((BUD / 10)) \
  SECONDS_PER_BATCH=180 \
  bash run_large.sh > _run_data/large_run_r5_scaled.log 2>&1
  rcE=$?
  tail -3 _run_data/large_run_r5_scaled.log
  [ $rcE -ne 0 ] && phase "PHASE E (large scaled) FAILED rc=$rcE (continuing)"
  python tools/collect_recipe_artifacts.py --exp _run_data/exp_large_r5_scaled \
    --log _run_data/large_run_r5_scaled.log --out docs/large_recipe_r5 \
    && phase "E artifacts -> docs/large_recipe_r5"
else
  phase "E SKIPPED (deadline or insurance run is the record)"
fi

phase "chain done"
