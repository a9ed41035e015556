"""Benchmark: the stage-1 distill step on real TPU hardware.

Metric (BASELINE.json north star): audio-seconds processed per wall-clock
second per chip for the full HuBERT Base distillation step — frozen teacher
forward + gated student forward/backward + 3-group AdamW update — at the
reference's per-GPU batch budget (160 s of audio, run.sh stage 1).

vs_baseline: the reference pipeline processes 50k steps x 160 s (stage 1)
+ 25k x 160 s (stage 2) = 12M audio-seconds in ~6 h on 4x A100
(README.md:84) => ~139 audio-sec/sec/chip.  A value of 1.0 here means
A100-parity per chip on the heavier (stage-1, gated) step.

Prints ONE JSON line.
"""

import json
import os
import time

import numpy as np

BASELINE_AUDIO_SEC_PER_SEC_PER_CHIP = 139.0
# wav2vec2-Large: the reference publishes no Large wall-clock (README.md:84
# covers the Base recipe only), so the per-chip baseline is DERIVED from the
# Base number by parameter count: 139 x (94.68M / 317.4M) — the Large recipe
# itself is run_large.sh:21-34,44-55 (60 s/batch/GPU, accum 3, 140k+70k).
LARGE_BASELINE_DERIVED = 41.5


def main():
    import jax

    from dphubert_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()
    # rbg (TPU hardware generator) is the production default — measured 6%
    # faster than threefry2x32 (183.0 vs 194.9 ms/step device time, r4
    # profile; the threefry mask subcomputations are a real slice of the
    # bandwidth-bound loop-fusion budget).  run.sh passes --rng_impl rbg;
    # DPHUBERT_RNG_IMPL overrides here.
    rng_impl = os.environ.get("DPHUBERT_RNG_IMPL") or "rbg"
    if rng_impl != "threefry2x32":
        jax.config.update("jax_default_prng_impl", rng_impl)

    from dphubert_tpu import hubert_base, wav2vec2_large, wav2vec2_model, wavlm_base
    from dphubert_tpu.train.distill_module import (
        DistillConfig,
        init_train_state,
        make_train_step,
    )

    # DPHUBERT_BENCH_MODEL: hubert_base (default headline) | wavlm (DPWavLM,
    # gated rel-pos bias path) | wav2vec2_large (run_large.sh recipe: 180 s
    # batch, 6-group layer2layer distill over the 24-layer teacher) |
    # pruned_inference (feature-extraction serving on the 21.95M student
    # produced by the 8k-step recipe run; config in docs/).
    model_name = os.environ.get("DPHUBERT_BENCH_MODEL", "hubert_base")
    if model_name == "pruned_inference":
        return bench_inference()
    factories = {
        "hubert_base": hubert_base,
        "wavlm": wavlm_base,
        "wav2vec2_large": wav2vec2_large,
    }
    teacher = factories[model_name]()
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

    if model_name == "wav2vec2_large":
        # run_large.sh: 6 distill groups over the 24-layer teacher.  remat +
        # lax.scan over the uniform layers: the 24-layer unrolled backward
        # graph exceeds the compile-server limits (same class as the B>=20
        # finding; see ROADMAP.md)
        dcfg = DistillConfig(
            compute_dtype="bfloat16",
            distill_layer_groups=((0,), (4, 8, 12, 16, 20, 24)),
            remat=True,
            scan_layers=True,
        )
    else:
        dcfg = DistillConfig(compute_dtype="bfloat16")
    state, tx = init_train_state(
        student=student,
        student_params=student_params,
        cfg=dcfg,
        teacher_embed_dim=teacher.spec.embed_dim,
        rng=jax.random.key(2),
    )
    step_fn = make_train_step(teacher, student, dcfg, tx, donate=True)

    # the reference budget is 160 s of audio per device per step (run.sh
    # stage 1); B=16 x 15 s = 240 s/chip is this chip's throughput optimum
    # (fits without remat, best MXU utilization in the batch sweep)
    T = 240_000  # 15 s clips
    B = 12 if model_name == "wav2vec2_large" else 16  # large: 180 s batch
    audio_sec = B * T / 16000.0
    # device-resident batch: the metric is the *train step* (the trainer
    # overlaps its int16 feed with compute via one-ahead prefetch, so feed
    # does not serialize with the step in real training).  A numpy batch
    # here would re-upload 15.36 MB per dispatch through the remote link —
    # measured +67 ms/step of pure transfer at K=1.
    import jax.numpy as jnp

    wave = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, T)).astype(np.float32)
    )
    batch = (wave, None)

    # warmup/compile — fetch a concrete value: under the axon relay,
    # block_until_ready can ack before remote execution completes, so only a
    # device->host value read is a trustworthy fence.
    state, m = step_fn(state, teacher_params, batch)
    float(m["loss"])

    # Sustained-run methodology: one long run of DPHUBERT_BENCH_STEPS
    # steps (default 400), timed as consecutive 50-step segments with a
    # concrete value fetch fencing each segment; the reported value is the
    # MEDIAN segment rate.  On a device-resident batch the distribution is
    # flat (0.184 s/step across all segments, r4) — earlier spread traced
    # to the numpy batch's per-dispatch re-upload contending with ambient
    # tunnel load, not to the compute.
    n_steps = int(os.environ.get("DPHUBERT_BENCH_STEPS", "400"))
    seg = 50
    times = []
    for _ in range(max(n_steps // seg, 1)):
        t0 = time.perf_counter()
        for _ in range(seg):
            state, m = step_fn(state, teacher_params, batch)
        final_loss = float(m["loss"])  # forces the whole chained segment
        times.append((time.perf_counter() - t0) / seg)
        assert np.isfinite(final_loss)
    dt = sorted(times)[len(times) // 2]

    value = audio_sec / dt
    baseline = (LARGE_BASELINE_DERIVED if model_name == "wav2vec2_large"
                else BASELINE_AUDIO_SEC_PER_SEC_PER_CHIP)
    extra = (
        {"baseline_note": "derived baseline: no measured reference Large "
         "wall-clock exists; 139 audio-sec/s/chip (Base, measured) scaled "
         "by the 94.68M/317.4M parameter ratio = 41.5"}
        if model_name == "wav2vec2_large" else {}
    )
    print(
        json.dumps(
            {
                "metric": "distill_step_audio_sec_per_sec_per_chip",
                "value": round(value, 2),
                "unit": "audio-sec/s/chip",
                "vs_baseline": round(value / baseline, 3),
                "detail": {
                    **extra,
                    "step_time_s": round(dt, 4),
                    "methodology": f"sustained {len(times)*seg}-step run, "
                    "device-resident batch (trainer feed is async "
                    "one-ahead prefetch, so feed overlaps compute in real "
                    f"training); value = median of {len(times)} x {seg}"
                    "-step segment rates (distribution below; "
                    "shared-tunnel ambient variance is real)",
                    "segment_step_times_s": [round(t, 4) for t in times],
                    "best_segment_step_time_s": round(min(times), 4),
                    "overall_step_time_s": round(sum(times) / len(times), 4),
                    "batch_audio_sec": audio_sec,
                    "batch_shape": [B, T],
                    "model": f"{model_name} distill step (teacher fwd + gated "
                    "student fwd/bwd + AdamW)",
                    "backend": jax.default_backend(),
                },
            }
        )
    )


def bench_inference():
    """Serving throughput: extract_features on the pruned 21.95M student
    (docs/pruned_config_r2.json, the artifact of the 8k-step recipe run)."""
    import pathlib

    import jax
    import jax.numpy as jnp

    from dphubert_tpu import wav2vec2_model

    cfg = json.load(
        open(pathlib.Path(__file__).parent / "docs" / "pruned_config_r2.json")
    )
    model = wav2vec2_model(**cfg)
    params = model.init(jax.random.key(0))

    B, T = 32, 240_000  # 8 min of audio per batch
    audio_sec = B * T / 16000.0
    wave = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, T)).astype(np.float32)
    ).astype(jnp.bfloat16)

    @jax.jit
    def fwd(p, w):
        outs, _ = model.extract_features(p, w, None)
        return outs[-1]

    y = fwd(params, wave)
    float(jnp.sum(y.astype(jnp.float32)))

    n_segments, n_iters = 8, 50
    times = []
    for _ in range(n_segments):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            y = fwd(params, wave)
        float(jnp.sum(y.astype(jnp.float32)))
        times.append((time.perf_counter() - t0) / n_iters)
    dt = sorted(times)[len(times) // 2]
    value = audio_sec / dt
    print(
        json.dumps(
            {
                "metric": "pruned_student_inference_audio_sec_per_sec_per_chip",
                "value": round(value, 2),
                "unit": "audio-sec/s/chip",
                "vs_baseline": round(value / BASELINE_AUDIO_SEC_PER_SEC_PER_CHIP, 3),
                "detail": {
                    "step_time_s": round(dt, 4),
                    "methodology": f"sustained {n_segments*n_iters}-iter run; "
                    f"median of {n_segments} x {n_iters}-iter segment rates",
                    "segment_step_times_s": [round(t, 4) for t in times],
                    "batch_audio_sec": audio_sec,
                    "batch_shape": [B, T],
                    "model": "21.95M pruned student extract_features (bf16)",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
