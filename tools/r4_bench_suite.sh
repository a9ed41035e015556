#!/bin/bash
# Round-4 chip session B: one quiet-window sustained-bench capture of all
# four bench modes (VERDICT r3 "reconcile the benchmark story"), then the
# DPWavLM 6k-step convergence run + surgery (VERDICT r3 missing #3).
# README/COMPONENTS numbers regenerate from these JSONs — same code path
# the driver captures in BENCH_r*.json.  bench.py defaults to rbg (the
# measured production impl, DESIGN.md "Mask generator").
set -uo pipefail
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p docs/bench_r4

for mode in hubert_base wavlm wav2vec2_large pruned_inference; do
  echo "[chip] $(date -Is) bench: $mode"
  DPHUBERT_BENCH_MODEL=$mode python bench.py \
    > "docs/bench_r4/${mode}.json" 2>"/tmp/bench_${mode}.err" \
    || { echo "bench $mode FAILED"; tail -5 "/tmp/bench_${mode}.err"; }
  cat "docs/bench_r4/${mode}.json" 2>/dev/null
done

echo "[chip] $(date -Is) DPWavLM convergence (6k steps, published hparams)"
python tools/convergence_run.py --model wavlm_base --steps 6000 \
  --target_sparsity 0.75 --sparsity_warmup 5000 \
  --out docs/convergence_wavlm_r4 2>&1 | tail -20

echo "[chip] $(date -Is) done"
