"""Export a portable ``{config, state_dict, distill_linear_projs}``
checkpoint from a *training* checkpoint (orbax directory or npz).

The stage CLIs export ``distilled.pth`` only when a stage runs to
completion; a wall-clock-deadline stop (exit 76) leaves just the training
checkpoint.  This tool performs the same export from that checkpoint so a
deadline-truncated stage still yields the downstream artifact (the
architecture is fixed at surgery time — stage 2 only refines weights —
so the export is valid at any step; document the truncation step).

Usage::

    python tools/export_from_ckpt.py \
        --student_ckpt exp/stage1/ckpts/pruned_hubert_base.pth \
        --ckpt exp/stage2/ckpts/orbax --rng_impl rbg \
        --distill_layers 0.4,8,12 --out exp/stage2/ckpts/distilled.pth
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--student_ckpt", type=pathlib.Path, required=True,
                    help="stage input .pth (defines config + param tree)")
    ap.add_argument("--ckpt", type=pathlib.Path, required=True,
                    help="orbax checkpoint dir (latest step) or .npz")
    ap.add_argument("--out", type=pathlib.Path, required=True)
    ap.add_argument("--distill_layers", default="0.4,8,12")
    ap.add_argument("--distill_mode", default="layer2layer",
                    choices=["layer2layer", "predlayer"])
    ap.add_argument("--teacher_embed_dim", type=int, default=768)
    ap.add_argument("--rng_impl", default="threefry2x32",
                    choices=["threefry2x32", "rbg"],
                    help="must match the training run (recorded in the ckpt)")
    ap.add_argument("--use_reg", action="store_true",
                    help="stage-1 (gated) checkpoint: build the gated "
                    "student + 3-group optimizer template")
    ap.add_argument("--pruning_units", default="conv,head,interm",
                    help="gate set of the stage-1 run (with --use_reg)")
    args = ap.parse_args()

    jax.config.update("jax_platforms", "cpu")
    if args.rng_impl != "threefry2x32":
        jax.config.update("jax_default_prng_impl", args.rng_impl)

    from dphubert_tpu.cli.common import load_model_ckpt
    from dphubert_tpu.train.distill_module import DistillConfig, init_train_state
    from dphubert_tpu.train.projections import parse_layer_groups
    from dphubert_tpu.train.trainer import export_student_checkpoint

    if args.use_reg:
        from dphubert_tpu.cli.common import apply_pruning_units, merge_params
        from dphubert_tpu.interop.torch_ckpt import load_checkpoint
        from dphubert_tpu.models.model import wav2vec2_model
        from dphubert_tpu.params import tree_to_jax, unflatten_params

        ckpt = load_checkpoint(args.student_ckpt)
        student = wav2vec2_model(
            **apply_pruning_units(ckpt["config"], args.pruning_units))
        fresh = student.init(jax.random.key(2022))
        student_params = merge_params(
            fresh, tree_to_jax(unflatten_params(ckpt["state_dict"])))
    else:
        student, student_params, _ = load_model_ckpt(args.student_ckpt)
    cfg = DistillConfig(
        use_reg=args.use_reg,
        distill_mode=args.distill_mode,
        distill_layer_groups=parse_layer_groups(args.distill_layers),
    )
    template, _ = init_train_state(
        student=student, student_params=student_params, cfg=cfg,
        teacher_embed_dim=args.teacher_embed_dim, rng=jax.random.key(0),
    )

    if args.ckpt.is_dir():
        from dphubert_tpu.train.checkpointing import AsyncCheckpointer

        mgr = AsyncCheckpointer(args.ckpt, async_save=False)
        restored = mgr.restore_latest(template)
        if restored is None:
            raise SystemExit(f"no checkpoints under {args.ckpt}")
        state, _pos = restored
        mgr.close()
    else:
        from dphubert_tpu.train.trainer import load_train_state

        state = load_train_state(args.ckpt, template)

    export_student_checkpoint(state, student, cfg, args.out)
    print(f"exported step-{int(state.step)} student -> {args.out}")


if __name__ == "__main__":
    main()
