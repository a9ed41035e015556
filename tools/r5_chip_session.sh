#!/bin/bash
# Round-5 chip session A: validate the background-checkpoint machinery on
# the real chip, then launch the full 50k+25k HuBERT recipe (run.sh) with
# the orbax default + background device->host gather (VERDICT r4 next #1).
#
#   1. device_snapshot non-aliasing check on TPU (the copy survives the
#      next step's buffer donation — a param-forwarding alias would hand
#      the checkpoint writer clobbered buffers).
#   2. Full recipe (stage 1-3) via run.sh on the synthetic corpus;
#      checkpoint-stall measurement comes from stage1 metrics.jsonl
#      (655 ms/step across npz crossing windows in r4 vs 154 clean).
set -uo pipefail
cd /root/repo
export PYTHONPATH=${PYTHONPATH:-}

echo "[chip] $(date -Is) 1. device_snapshot donation-safety check (TPU)"
python - <<'EOF'
import jax, numpy as np, jax.numpy as jnp
print("backend:", jax.default_backend())
from dphubert_tpu import wav2vec2_model
from dphubert_tpu.train.checkpointing import device_snapshot
from dphubert_tpu.train.distill_module import DistillConfig, init_train_state
from tests.test_forward_parity import _tiny_w2v2_config  # noqa: E501 tiny config helper

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

echo "[chip] $(date -Is) 2. library drive (verify-skill surface)"
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

echo "[chip] $(date -Is) 3. WavLM kernel TPU compile check + bench (fast path)"
DPHUBERT_BENCH_MODEL=wavlm python bench.py > /tmp/bench_wavlm_r5.json 2>/tmp/bench_wavlm_r5.err
rc=$?
cat /tmp/bench_wavlm_r5.json
if [ $rc -ne 0 ]; then
  echo "WAVLM BENCH FAILED (rc=$rc) — tail of stderr:"; tail -30 /tmp/bench_wavlm_r5.err
fi

echo "[chip] $(date -Is) 4. full recipe launch (50k+25k, orbax + bg gather)"
TSV_DIR=_run_data/tsv TRAIN_SUBSET=train100 \
TEACHER_CKPT=_run_data/pretrained/hubert-base-synth.pth \
EXP_DIR=_run_data/exp_full_r5 \
nohup bash run.sh > _run_data/full_run_r5.log 2>&1 &
echo $! > /tmp/full_run_r5.pid
echo "launched pid $(cat /tmp/full_run_r5.pid); log _run_data/full_run_r5.log"
