"""On-chip controller-convergence run: stage-1 joint distill+prune at the
published hyperparameters, then mask surgery, on synthetic batches.

Evidence generator for the Lagrangian controller (reference run.sh:29-41
hyperparameters; expected endpoint reference README.md:109-112 — DPHuBERT
23,585,946 / DPWavLM 23,586,325 params from ~94.7M at sparsity 0.75):
sparsity must lock onto the target and surgery must produce a ~22-24M-param
heterogeneous student.  Produced docs/convergence_r2.jsonl (HuBERT, 8k
steps) and docs/convergence_wavlm_r4.jsonl (DPWavLM, 6k steps).

Usage::

    nohup python tools/convergence_run.py --model wavlm_base \
        --steps 6000 --out docs/convergence_wavlm_r4 &
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="hubert_base",
                    choices=["hubert_base", "wavlm_base"])
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--log_every", type=int, default=100)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=15.0)
    ap.add_argument("--target_sparsity", type=float, default=0.75)
    ap.add_argument("--sparsity_warmup", type=int, default=5000)
    ap.add_argument("--out", default="/tmp/convergence",
                    help="prefix: writes <out>.jsonl (trajectory), "
                    "<out>_summary.json, <out>_pruned_config.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dphubert_tpu import hubert_base, wav2vec2_model, wavlm_base
    from dphubert_tpu.params import num_leaves_numel
    from dphubert_tpu.train.distill_module import (
        DistillConfig,
        init_train_state,
        make_train_step,
    )
    from dphubert_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()

    teacher = {"hubert_base": hubert_base, "wavlm_base": wavlm_base}[args.model]()
    cfg_gated = dict(
        teacher.config,
        extractor_prune_conv_channels=True,
        encoder_prune_attention_heads=True,
        encoder_prune_attention_layer=True,
        encoder_prune_feed_forward_intermediate=True,
        encoder_prune_feed_forward_layer=True,
    )
    student = wav2vec2_model(**cfg_gated)
    teacher_params = teacher.init(jax.random.key(0))
    student_params = student.init(jax.random.key(1))

    dcfg = DistillConfig(
        compute_dtype="bfloat16",
        target_sparsity=args.target_sparsity,
        sparsity_warmup_updates=args.sparsity_warmup,
    )
    state, tx = init_train_state(
        student=student, student_params=student_params, cfg=dcfg,
        teacher_embed_dim=teacher.spec.embed_dim, rng=jax.random.key(2),
    )
    step_fn = make_train_step(teacher, student, dcfg, tx, donate=True)

    B, T = args.batch, int(args.seconds * 16000)
    rng = np.random.default_rng(0)
    batches = [
        (jnp.asarray(rng.standard_normal((B, T)).astype(np.float32) * 0.1), None)
        for _ in range(12)
    ]

    traj = []
    t_start = time.time()
    state, m = step_fn(state, teacher_params, batches[0])
    print(f"compiled in {time.time()-t_start:.0f}s loss={float(m['loss']):.4f}",
          flush=True)

    t0 = time.time()
    for i in range(1, args.steps):
        state, m = step_fn(state, teacher_params, batches[i % len(batches)])
        if i % args.log_every == 0:
            rec = {
                "step": i,
                "loss": float(m["loss"]),
                "loss_distill": float(m.get("loss_distill", np.nan)),
                "sparsity": float(m["sparsity_expected"]),
                "target": float(m["sparsity_target"]),
                "lambda1": float(m["lambda1"]),
                "lambda2": float(m["lambda2"]),
                "sec_per_step": (time.time() - t0) / args.log_every,
            }
            t0 = time.time()
            traj.append(rec)
            print(json.dumps(rec), flush=True)

    with open(args.out + ".jsonl", "w") as f:
        for r in traj:
            f.write(json.dumps(r) + "\n")

    # surgery: deterministic gate probe -> index-select -> param count
    n_before = num_leaves_numel(jax.tree.map(np.asarray, state.params["student"]))
    new_model, new_params = student.prune(state.params["student"])
    n_after = num_leaves_numel(jax.tree.map(np.asarray, new_params))
    summary = {
        "model": args.model,
        "steps": args.steps,
        "final_sparsity_expected": traj[-1]["sparsity"],
        "params_before": int(n_before),
        "params_after": int(n_after),
        "reference_expect": "DPHuBERT 23,585,946 / DPWavLM 23,586,325 at "
        "sparsity 0.75 from real data (README.md:109-112)",
    }
    print("SUMMARY", json.dumps(summary), flush=True)
    with open(args.out + "_summary.json", "w") as f:
        json.dump(summary, f, indent=1)
    with open(args.out + "_pruned_config.json", "w") as f:
        json.dump(new_model.config, f, indent=1, default=str)
    print("CONVERGE_OK", flush=True)


if __name__ == "__main__":
    main()
