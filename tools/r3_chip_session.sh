#!/bin/bash
# Round-3 post-recipe chip session: runs serially on the single TPU chip
# AFTER the full-recipe demonstration completes (one TPU process at a time).
#
#   1. DPWavLM stage-1 convergence run (published hyperparameters, 6k steps
#      so the 5k sparsity warmup completes) + surgery  -> docs/convergence_wavlm_r3.*
#   2. Per-category xprof profile of the distill step, threefry vs
#      counter-hash dropout masks                      -> /tmp/profile_{threefry,hash}.log
#   3. Sustained bench, both dropout impls             -> /tmp/bench_{threefry,hash}.json
set -uo pipefail
cd /root/repo

echo "[chip] $(date -Is) 1. DPWavLM convergence (6k steps)"
python tools/convergence_run.py --model wavlm_base --steps 6000 \
  --target_sparsity 0.75 --sparsity_warmup 5000 \
  --out docs/convergence_wavlm_r3 2>&1 | tail -20

echo "[chip] $(date -Is) 2a. profile: threefry dropout"
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
  python tools/profile_step.py > /tmp/profile_threefry.log 2>&1
tail -15 /tmp/profile_threefry.log

echo "[chip] $(date -Is) 2b. profile: counter-hash dropout"
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python DPHUBERT_DROPOUT_IMPL=hash \
  python tools/profile_step.py > /tmp/profile_hash.log 2>&1
tail -15 /tmp/profile_hash.log

echo "[chip] $(date -Is) 3a. bench: threefry"
python bench.py > /tmp/bench_threefry.json 2>/tmp/bench_threefry.err
cat /tmp/bench_threefry.json

echo "[chip] $(date -Is) 3b. bench: hash"
DPHUBERT_DROPOUT_IMPL=hash python bench.py > /tmp/bench_hash.json 2>/tmp/bench_hash.err
cat /tmp/bench_hash.json

echo "[chip] $(date -Is) done"
