"""Per-op-category TPU profile of the stage-1 distill step.

Captures a 3-step xprof trace of the jitted train step and aggregates
device time by HLO category ("convolution fusion" = all matmuls on TPU,
"loop fusion" = bandwidth-bound elementwise, "custom-call" = Pallas
kernels).  The tensorboard-plugin converters are broken against the
installed TF, so the xplane proto is parsed directly (tsl protobuf,
pure-python protobuf impl).

Usage::

    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python tools/profile_step.py [--model hubert_base] [--batch 16]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import tempfile


def parse_xplane(logdir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane under {logdir}"
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(paths[-1], "rb").read())
    for plane in xs.planes:
        if "/device:TPU:0" not in plane.name:
            continue
        by_cat = collections.Counter()
        stat_names = {i: m.name for i, m in plane.stat_metadata.items()}

        def _category(stats):
            for st in stats:
                if stat_names.get(st.metadata_id) == "hlo_category":
                    return (st.str_value
                            or stat_names.get(st.ref_value, "?"))
            return None

        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                # newer xplane puts hlo_category on the event *metadata*
                # stats (shared per HLO op); older formats on each event
                md = plane.event_metadata.get(ev.metadata_id)
                cat = (_category(md.stats if md is not None else ())
                       or _category(ev.stats) or "?")
                by_cat[cat] += ev.duration_ps
        return by_cat
    raise RuntimeError("TPU plane not found")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="hubert_base",
                    choices=["hubert_base", "wavlm_base"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=15.0)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--rng_impl", default="threefry2x32",
                    choices=["threefry2x32", "rbg"],
                    help="jax global PRNG impl (rbg = TPU hardware "
                    "generator for the mask draws)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.rng_impl != "threefry2x32":
        jax.config.update("jax_default_prng_impl", args.rng_impl)

    from dphubert_tpu import hubert_base, wav2vec2_model, wavlm_base
    from dphubert_tpu.train.distill_module import (
        DistillConfig, init_train_state, make_train_step,
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
    dcfg = DistillConfig(compute_dtype="bfloat16")
    state, tx = init_train_state(
        student=student, student_params=student.init(jax.random.key(1)),
        cfg=dcfg, teacher_embed_dim=teacher.spec.embed_dim,
        rng=jax.random.key(2),
    )
    tp = teacher.init(jax.random.key(0))
    step_fn = make_train_step(teacher, student, dcfg, tx, donate=True)
    B, T = args.batch, int(args.seconds * 16000)
    wave = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, T)).astype(np.float32)
    )
    batch = (wave, None)
    state, m = step_fn(state, tp, batch)
    print("compiled; warm loss", float(m["loss"]))

    logdir = tempfile.mkdtemp(prefix="xprof_")
    jax.profiler.start_trace(logdir)
    for _ in range(args.steps):
        state, m = step_fn(state, tp, batch)
    float(m["loss"])
    jax.profiler.stop_trace()

    by_cat = parse_xplane(logdir)
    total = sum(by_cat.values())
    print(f"\nper-step device time (avg over {args.steps} steps):")
    for cat, ps in by_cat.most_common():
        ms = ps / 1e9 / args.steps
        print(f"  {cat:28s} {ms:8.2f} ms  {100*ps/total:5.1f}%")
    print(f"  {'TOTAL':28s} {total/1e9/args.steps:8.2f} ms")


if __name__ == "__main__":
    main()
