"""Stage 1.5: mask surgery (reference ``prune.py``).

Consumes the stage-1 distilled checkpoint, rebuilds the gated model, prunes,
and writes ``pruned_hubert_base.pth`` with the heterogeneous config —
verified by a strict reload, exactly like the reference.
"""

from __future__ import annotations

import json
import pathlib
from argparse import ArgumentParser

import jax
import numpy as np

from .common import force_cpu_for_host_stage
from ..interop.torch_ckpt import load_checkpoint, save_checkpoint, verify_strict
from ..models.model import wav2vec2_model
from ..params import flatten_params, tree_to_jax, unflatten_params


def _infer_prune_flags(state_dict) -> dict:
    """Probe gate keys to recover which pruning units were on
    (reference ``prune.py:20-28``)."""
    return dict(
        extractor_prune_conv_channels=(
            "feature_extractor.conv_layers.0.hard_concrete.log_alpha" in state_dict
        ),
        encoder_prune_attention_heads=(
            "encoder.transformer.layers.0.attention.hard_concrete_for_heads.log_alpha"
            in state_dict
        ),
        encoder_prune_attention_layer=(
            "encoder.transformer.layers.0.attention.hard_concrete_for_layer.log_alpha"
            in state_dict
        ),
        encoder_prune_feed_forward_intermediate=(
            "encoder.transformer.layers.0.feed_forward.hard_concrete_for_intermediate.log_alpha"
            in state_dict
        ),
        encoder_prune_feed_forward_layer=(
            "encoder.transformer.layers.0.feed_forward.hard_concrete_for_layer.log_alpha"
            in state_dict
        ),
    )


def prune_from_ckpt(distilled_ckpt, original_ckpt=None) -> dict:
    ckpt = load_checkpoint(distilled_ckpt)
    state_dict = ckpt["state_dict"]
    # Lightning-style checkpoints prefix student params; ours don't.
    if any(k.startswith("student_model.") for k in state_dict):
        state_dict = {
            k[len("student_model."):]: v
            for k, v in state_dict.items()
            if k.startswith("student_model.")
        }
    if original_ckpt is not None:
        config = dict(load_checkpoint(original_ckpt)["config"])
    else:
        config = dict(ckpt["config"])
    config.update(_infer_prune_flags(state_dict))

    model = wav2vec2_model(**config)
    params = tree_to_jax(unflatten_params(state_dict))
    verify_strict(model, state_dict)

    new_model, new_params = model.prune(params)
    pruned_config = new_model.config
    print(json.dumps(pruned_config, indent=4))

    return {
        "state_dict": flatten_params(jax.tree.map(np.asarray, new_params)),
        "config": pruned_config,
        "distill_linear_projs": ckpt.get("distill_linear_projs", {}),
    }


def load_pruned_model(ckpt_path):
    ckpt = load_checkpoint(ckpt_path)
    model = wav2vec2_model(**ckpt["config"])
    verify_strict(model, ckpt["state_dict"])
    return model


def parse_args():
    parser = ArgumentParser(description="Prune and save distilled model.")
    parser.add_argument("--distilled_ckpt", type=pathlib.Path, required=True)
    parser.add_argument("--original_ckpt", type=pathlib.Path, default=None,
                        help="Source of the base config (optional if the "
                        "distilled ckpt embeds its config).")
    parser.add_argument("--out", type=pathlib.Path, default=None)
    return parser.parse_args()


def cli_main():
    force_cpu_for_host_stage()
    args = parse_args()
    out_path = args.out or (args.distilled_ckpt.parent / "pruned_hubert_base.pth")
    ret = prune_from_ckpt(args.distilled_ckpt, args.original_ckpt)
    save_checkpoint(
        out_path, ret["config"], ret["state_dict"], ret["distill_linear_projs"]
    )
    load_pruned_model(out_path)  # strict reload check
    print(f"Successfully saved pruned model weights and config to: {out_path}")


if __name__ == "__main__":
    cli_main()
