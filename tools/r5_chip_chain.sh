#!/bin/bash
# Round-5 chip chain: one serialized TPU session driving every r5 on-chip
# deliverable back-to-back so the single chip never idles (VERDICT r4
# next #1/#2/#3).  Phases:
#
#   0. device_snapshot donation-safety check (the background checkpoint
#      gather hands the writer a device-side copy; a param-forwarding
#      alias would let the next donated train step clobber it).
#   1. library drive (verify-skill surface) + WavLM fast-path kernel
#      TPU compile check via the wavlm bench mode.
#   2. HuBERT full 50k+25k recipe (run.sh, orbax + background gather)
#      -> _run_data/exp_full_r5 (VERDICT #1: sustained s/step within
#      ~10% of the clean inter-checkpoint rate, wall <= ~4 h).
#   3. Large scaled-budget pipeline through run_large.sh (5k+2.5k,
#      REMAT=1 SCAN_LAYERS=1 defaults) -> _run_data/exp_large_r5
#      (VERDICT #2: all 4 stages complete on-chip).
#   4. WavLM full 50k+25k recipe -> _run_data/exp_wavlm_r5
#      (VERDICT #3: sparsity ~0.75, ~23.6M student, strict reload).
#   5. bench captures for docs/bench_r5 (hubert/wavlm/large/inference).
#
# A phase failure logs loudly and the chain continues (later phases are
# independent deliverables).
set -uo pipefail
cd /root/repo
export PYTHONPATH=${PYTHONPATH:-}

phase() { echo "[chain] $(date -Is) $*"; }

phase "0. device_snapshot donation-safety check (TPU)"
python - <<'EOF'
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
[ $rc0 -ne 0 ] && echo "[chain] PHASE 0 FAILED rc=$rc0 (continuing)"

phase "1a. library drive (verify-skill surface)"
python - <<'EOF'
import numpy as np, jax, dphubert_tpu as dp
model = dp.hubert_base()
params = model.init(jax.random.key(0))
wave = np.random.default_rng(0).standard_normal((2, 32000)).astype(np.float32)
outs, lens = model.extract_features(params, wave)
assert len(outs) == 13, len(outs)
logits, ls = model.forward(params, wave, np.array([32000, 24000]))
print("OK: extract_features 13 states", outs[-1].shape, "forward", logits.shape)
EOF
rc1=$?
[ $rc1 -ne 0 ] && echo "[chain] PHASE 1a FAILED rc=$rc1 (continuing)"

phase "1b. WavLM fast-path kernel TPU compile check + bench"
DPHUBERT_BENCH_MODEL=wavlm python bench.py > /tmp/bench_wavlm_r5.json 2>/tmp/bench_wavlm_r5.err
rc=$?
cat /tmp/bench_wavlm_r5.json
if [ $rc -ne 0 ]; then
  echo "[chain] WAVLM BENCH FAILED (rc=$rc) — tail of stderr:"; tail -30 /tmp/bench_wavlm_r5.err
fi

phase "2. HuBERT full recipe (50k+25k, orbax + background gather)"
TSV_DIR=_run_data/tsv TRAIN_SUBSET=train100 \
TEACHER_CKPT=_run_data/pretrained/hubert-base-synth.pth \
EXP_DIR=_run_data/exp_full_r5 \
bash run.sh > _run_data/full_run_r5.log 2>&1
rc2=$?
tail -3 _run_data/full_run_r5.log
[ $rc2 -ne 0 ] && echo "[chain] PHASE 2 (hubert recipe) FAILED rc=$rc2 (continuing)"

phase "3. Large scaled-budget pipeline (run_large.sh, 5k+2.5k)"
TSV_DIR=_run_data/tsv TRAIN_SUBSET=train100 \
TEACHER_CKPT=_run_data/pretrained/wav2vec2-large-synth.pth \
EXP_DIR=_run_data/exp_large_r5 \
MAX_UPDATES=5000 WARMUP_UPDATES=1500 SPARSITY_WARMUP_UPDATES=1500 \
FINAL_MAX_UPDATES=2500 FINAL_WARMUP_UPDATES=500 \
SECONDS_PER_BATCH=180 \
bash run_large.sh > _run_data/large_run_r5.log 2>&1
rc3=$?
tail -3 _run_data/large_run_r5.log
[ $rc3 -ne 0 ] && echo "[chain] PHASE 3 (large pipeline) FAILED rc=$rc3 (continuing)"

phase "4. WavLM full recipe (50k+25k)"
TSV_DIR=_run_data/tsv TRAIN_SUBSET=train100 \
TEACHER_CKPT=_run_data/pretrained/wavlm-base-synth.pth \
EXP_DIR=_run_data/exp_wavlm_r5 \
bash run.sh > _run_data/wavlm_run_r5.log 2>&1
rc4=$?
tail -3 _run_data/wavlm_run_r5.log
[ $rc4 -ne 0 ] && echo "[chain] PHASE 4 (wavlm recipe) FAILED rc=$rc4 (continuing)"

phase "5. bench captures -> docs/bench_r5"
mkdir -p docs/bench_r5
for mode in hubert_base wavlm wav2vec2_large pruned_inference; do
  phase "5. bench $mode"
  DPHUBERT_BENCH_MODEL=$mode python bench.py \
    > docs/bench_r5/$mode.json 2>/tmp/bench_r5_$mode.err || \
    { echo "[chain] bench $mode FAILED"; tail -5 /tmp/bench_r5_$mode.err; }
  cat docs/bench_r5/$mode.json 2>/dev/null
done

phase "done (rcs: $rc0/$rc1/$rc2/$rc3/$rc4)"
