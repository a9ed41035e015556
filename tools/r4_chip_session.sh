#!/bin/bash
# Round-4 chip session A (EXECUTED 2026-08-17, results in docs/ + DESIGN.md):
# the mask-generator decision data (VERDICT r3 #3/#4).
#
#   1. Per-category xprof profile of the distill step under each mask
#      generator -> docs/profile_r4_{threefry,rbg,hash}.log
#        threefry2x32 (jax default):       194.88 ms/step device time
#        rbg (TPU hardware generator):     183.01 ms/step  <- winner (-6.1%)
#        counter-hash (out-of-kernel):     DOES NOT COMPILE — mask fusions
#          push the packed-attention backward 1.74 MB over the 16 MB Mosaic
#          scoped-VMEM limit (the impl was deleted; log kept as evidence)
#   2. Sustained bench: threefry 948.2, rbg 976.1 audio-sec/s/chip.
#
# Decision: recipes (run.sh) pass --rng_impl rbg; checkpoints record the
# impl and a mismatched resume fails loudly.  Session B:
# tools/r4_bench_suite.sh (all four bench modes) + the WavLM convergence run.
set -uo pipefail
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

echo "[chip] $(date -Is) 1a. profile: threefry2x32"
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
  python tools/profile_step.py > docs/profile_r4_threefry.log 2>&1
tail -16 docs/profile_r4_threefry.log

echo "[chip] $(date -Is) 1b. profile: rbg"
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
  python tools/profile_step.py --rng_impl rbg > docs/profile_r4_rbg.log 2>&1
tail -16 docs/profile_r4_rbg.log

echo "[chip] $(date -Is) 2a. bench: threefry"
DPHUBERT_RNG_IMPL=threefry2x32 python bench.py \
  > /tmp/bench_threefry.json 2>/tmp/bench_threefry.err
cat /tmp/bench_threefry.json

echo "[chip] $(date -Is) 2b. bench: rbg (production default)"
python bench.py > /tmp/bench_rbg.json 2>/tmp/bench_rbg.err
cat /tmp/bench_rbg.json

echo "[chip] $(date -Is) done"
