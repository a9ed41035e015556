"""Stage 1: joint distillation + pruning (reference ``distill.py``).

Usage mirrors the reference CLI::

    python -m dphubert_tpu.cli.distill \
        --tsv_dir data/librispeech --train_subset train960 \
        --teacher_ckpt pretrained/hubert-base-ls960.pth \
        --student_ckpt pretrained/hubert-base-ls960.pth \
        --exp_dir exp/stage1 --max_updates 50000 ...
"""

from __future__ import annotations

import pathlib
from argparse import ArgumentParser

import jax

from ..models.model import wav2vec2_model
from ..parallel.mesh import create_mesh
from ..train.distill_module import DistillConfig
from ..train.projections import parse_layer_groups
from ..train.trainer import export_student_checkpoint, train
from .common import apply_pruning_units, build_loader, load_model_ckpt, merge_params


def add_common_training_args(parser: ArgumentParser) -> None:
    parser.add_argument("--tsv_dir", type=pathlib.Path, required=True)
    parser.add_argument("--train_subset", default="train100",
                        choices=["train100", "train960"])
    parser.add_argument("--seconds_per_batch", default=87.5, type=float)
    parser.add_argument("--num_workers", default=8, type=int)
    parser.add_argument("--num_shapes", default=12, type=int,
                        help="Number of static length buckets (TPU shape set).")
    parser.add_argument("--resume_checkpoint", type=pathlib.Path, default=None,
                        help="npz file (sync format) or orbax checkpoint "
                        "directory; directories restore the latest step.")
    parser.add_argument("--exp_dir", default=pathlib.Path("./exp"), type=pathlib.Path)
    parser.add_argument("--ckpt_interval", default=1000, type=int)
    parser.add_argument("--ckpt_backend", default="npz",
                        choices=["npz", "orbax"],
                        help="npz: synchronous last-only; orbax: async "
                        "background writes with keep-last-N rotation "
                        "(multi-host safe).")
    parser.add_argument("--ckpt_keep", default=3, type=int,
                        help="Checkpoints retained under --ckpt_backend orbax.")
    parser.add_argument("--log_interval", default=50, type=int)
    parser.add_argument("--learning_rate", default=0.0002, type=float)
    parser.add_argument("--weight_decay", default=0.0, type=float)
    parser.add_argument("--warmup_updates", default=15000, type=int)
    parser.add_argument("--max_updates", default=50000, type=int)
    parser.add_argument("--clip_norm", default=10.0, type=float)
    parser.add_argument("--num_data_shards", default=0, type=int,
                        help="Mesh data-axis size (0 = all local devices).")
    parser.add_argument("--tensor_parallel", default=1, type=int,
                        help="Mesh model-axis size: attention/FFN inner dims "
                        "sharded over it (Megatron-style row/column split).")
    parser.add_argument("--fsdp", action="store_true",
                        help="ZeRO-3-style layouts: shard params, Adam "
                        "moments, and the frozen teacher over the data axis "
                        "(per-device memory ~1/n_data; XLA inserts the "
                        "all-gathers/reduce-scatters). Composes with "
                        "--tensor_parallel (HSDP).")
    parser.add_argument("--accum_grad", default=1, type=int)
    parser.add_argument("--precision", default="bf16", choices=["bf16", "fp32"],
                        help="Compute dtype (TPU default bf16; params fp32).")
    parser.add_argument("--remat", action="store_true",
                        help="Per-layer activation checkpointing (larger "
                        "batches at ~30%% extra student FLOPs).")
    parser.add_argument("--scan_layers", action="store_true",
                        help="lax.scan over uniform encoder layers: one "
                        "compiled layer body instead of N unrolled copies. "
                        "Required (with --remat) for the 24-layer Large "
                        "family, whose unrolled backward exceeds the "
                        "compile-server whole-graph limits. Heterogeneous "
                        "pruned students automatically fall back to the "
                        "unrolled path; the flag then still applies to the "
                        "uniform teacher.")
    parser.add_argument("--teacher_ckpt", type=pathlib.Path, required=True)
    parser.add_argument("--student_ckpt", type=pathlib.Path, required=True)
    parser.add_argument("--distill_layers", default="0.4,8,12", type=str)
    parser.add_argument("--distill_mode", default="layer2layer",
                        choices=["layer2layer", "predlayer"])
    parser.add_argument("--l2_weight", default=0.0, type=float)
    parser.add_argument("--l1_weight", default=1.0, type=float)
    parser.add_argument("--cos_weight", default=1.0, type=float)
    parser.add_argument("--cos_type", default="raw", choices=["raw", "log_sig"])
    parser.add_argument("--seed", default=2022, type=int)
    parser.add_argument("--rng_impl", default="threefry2x32",
                        choices=["threefry2x32", "rbg"],
                        help="PRNG implementation for dropout/gate sampling. "
                        "rbg uses the TPU hardware generator — measured 6%% "
                        "faster steps on v5e (183.0 vs 194.9 ms device "
                        "time; the production recipes pass it). Same "
                        "explicit-key determinism within an impl. The impl "
                        "is recorded in training checkpoints; a resume "
                        "under a different impl fails loudly instead of "
                        "silently changing the mask stream. Caveat: JAX "
                        "documents rbg bits as NOT guaranteed stable across "
                        "XLA/libtpu versions, so a runtime upgrade mid-run "
                        "can change the mask stream while passing that "
                        "guard — use threefry2x32 for runs that must be "
                        "bit-reproducible across environment upgrades.")
    parser.add_argument("--steps_per_dispatch", default=1, type=int,
                        help="Stack K consecutive same-shape batches into "
                        "one jitted multi-step dispatch (lax.scan): one "
                        "launch + one feed transfer per K steps. Keeps the "
                        "device saturated behind slow host links; K=1 is "
                        "the plain per-step loop. The batcher emits "
                        "same-shape runs of K so stacks actually form.")
    parser.add_argument("--val_interval", default=0, type=int,
                        help="Validate every N steps in addition to epoch "
                        "boundaries (0 = epoch boundaries only). At train960 "
                        "scale one epoch is tens of thousands of steps, so "
                        "set this for within-run validation signal.")
    parser.add_argument("--compile_cache_dir", default=None,
                        help="Persistent XLA compilation cache directory "
                        "(default ~/.cache/dphubert_tpu/xla; env "
                        "DPHUBERT_COMPILE_CACHE=off disables). Later "
                        "processes skip the multi-minute per-shape remote "
                        "compiles.")


def _parse_args():
    parser = ArgumentParser(description="Joint distillation and pruning (stage 1)")
    add_common_training_args(parser)
    parser.add_argument("--pruning_units", default="conv,head,interm,attlayer,ffnlayer")
    parser.add_argument("--reg_learning_rate", default=0.02, type=float)
    parser.add_argument("--target_sparsity", default=0.75, type=float)
    parser.add_argument("--sparsity_warmup_updates", default=5000, type=int)
    return parser.parse_args()


def run_train(args, use_reg: bool = True):
    from ..utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache(getattr(args, "compile_cache_dir", None))
    if getattr(args, "rng_impl", "threefry2x32") != "threefry2x32":
        jax.config.update("jax_default_prng_impl", args.rng_impl)
    teacher, teacher_params, _ = load_model_ckpt(args.teacher_ckpt)

    _, _, student_ckpt = load_model_ckpt(args.student_ckpt)
    student_config = student_ckpt["config"]
    if use_reg:
        student_config = apply_pruning_units(student_config, args.pruning_units)
    student = wav2vec2_model(**student_config)
    # strict=False load: pretrained weights + freshly-initialized gates
    from ..params import tree_to_jax, unflatten_params

    fresh = student.init(jax.random.key(args.seed))
    student_params = merge_params(
        fresh, tree_to_jax(unflatten_params(student_ckpt["state_dict"]))
    )

    cfg = DistillConfig(
        distill_mode=args.distill_mode,
        distill_layer_groups=parse_layer_groups(args.distill_layers),
        l2_weight=args.l2_weight,
        l1_weight=args.l1_weight,
        cos_weight=args.cos_weight,
        cos_type=args.cos_type,
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        warmup_updates=args.warmup_updates,
        max_updates=args.max_updates,
        clip_norm=args.clip_norm,
        use_reg=use_reg,
        reg_learning_rate=getattr(args, "reg_learning_rate", 0.0),
        target_sparsity=getattr(args, "target_sparsity", 0.0),
        sparsity_warmup_updates=getattr(args, "sparsity_warmup_updates", 1),
        compute_dtype="bfloat16" if args.precision == "bf16" else "float32",
        remat=getattr(args, "remat", False),
        scan_layers=getattr(args, "scan_layers", False),
        accum_grad=args.accum_grad,
    )

    from ..parallel.multihost import initialize as multihost_init

    multihost_init()
    n_model = max(1, args.tensor_parallel)
    if n_model > len(jax.devices()):
        raise SystemExit(
            f"--tensor_parallel {n_model} needs at least {n_model} devices "
            f"but only {len(jax.devices())} are visible"
        )
    n_dev = args.num_data_shards or (len(jax.devices()) // n_model)
    mesh = create_mesh(n_data=n_dev, n_model=n_model)
    loader = build_loader(args, args.train_subset, num_replicas=n_dev,
                          run_length=getattr(args, "steps_per_dispatch", 1),
                          shuffle_seed=args.seed)
    valid_loader = None
    try:
        valid_loader = build_loader(args, "valid", num_replicas=n_dev,
                                    shuffle_seed=args.seed)
    except FileNotFoundError:
        pass

    proj_sd = student_ckpt.get("distill_linear_projs") if not use_reg else None

    stop_info: dict = {}
    state = train(
        teacher=teacher,
        teacher_params=teacher_params,
        student=student,
        student_params=student_params,
        cfg=cfg,
        loader=loader,
        valid_loader=valid_loader,
        exp_dir=args.exp_dir,
        mesh=mesh,
        log_interval=args.log_interval,
        ckpt_interval=args.ckpt_interval,
        ckpt_backend=args.ckpt_backend,
        ckpt_keep=args.ckpt_keep,
        resume=args.resume_checkpoint,
        seed=args.seed,
        proj_state_dict=proj_sd,
        tensor_parallel=n_model > 1,
        fsdp=args.fsdp,
        val_interval=getattr(args, "val_interval", 0) or None,
        steps_per_dispatch=getattr(args, "steps_per_dispatch", 1),
        stop_info=stop_info,
    )

    # A SIGTERM/watchdog-preempted run checkpoints and returns early; exit
    # with EX_TEMPFAIL *before* exporting, so no partial stage artifact
    # lands at the stage-output path (and no 94M-param host gather runs)
    # between retries — resume with --resume_checkpoint <exp_dir>/ckpts/....
    # A wall-clock deadline stop (DPHUBERT_DEADLINE_TS) exits 76 instead:
    # the checkpoint is equally resumable, but the recipe driver must NOT
    # auto-resume into the same expired deadline.
    accum = max(cfg.accum_grad, 1)
    if stop_info.get("why") == "deadline":
        print(f"[distill] wall-clock deadline at step {int(state.step)} "
              f"(< {args.max_updates} updates): exiting 76 (checkpointed; "
              "resume later with --resume_checkpoint)")
        raise SystemExit(76)
    if int(state.step) < args.max_updates * accum:
        print(f"[distill] preempted at step {int(state.step)} "
              f"(< {args.max_updates} updates): exiting 75 (resumable)")
        raise SystemExit(75)

    out = pathlib.Path(args.exp_dir) / "ckpts" / "distilled.pth"
    export_student_checkpoint(state, student, cfg, out)
    print(f"Saved distilled checkpoint to {out}")
    return state


def cli_main():
    run_train(_parse_args(), use_reg=True)


if __name__ == "__main__":
    cli_main()
