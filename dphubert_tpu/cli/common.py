"""Shared CLI plumbing for the pipeline stages."""

from __future__ import annotations

import jax

from ..data import AudioDataset, DistillDataLoader, StaticShapeBatcher
from ..interop.torch_ckpt import load_checkpoint
from ..models.model import wav2vec2_model
from ..params import tree_to_jax, unflatten_params


def load_model_ckpt(path):
    """Checkpoint -> (model, params, raw ckpt dict)."""
    ckpt = load_checkpoint(path)
    model = wav2vec2_model(**ckpt["config"])
    params = tree_to_jax(unflatten_params(ckpt["state_dict"]))
    return model, params, ckpt


def apply_pruning_units(config: dict, pruning_units: str) -> dict:
    """Inject prune-enable flags from the --pruning_units CSV
    (reference ``distill.py:67-78``)."""
    units = pruning_units.split(",") if pruning_units else []
    config = dict(config)
    config.update(
        extractor_prune_conv_channels="conv" in units,
        encoder_prune_attention_heads="head" in units,
        encoder_prune_attention_layer="attlayer" in units,
        encoder_prune_feed_forward_intermediate="interm" in units,
        encoder_prune_feed_forward_layer="ffnlayer" in units,
    )
    return config


def merge_params(template, source):
    """Overlay ``source`` leaves onto ``template`` where paths coincide —
    used to load an ungated checkpoint into a gated student (the gate
    log_alphas keep their fresh init), mirroring strict=False loading
    (reference ``distill.py:81``)."""
    out = {}
    for k, v in template.items():
        if isinstance(v, dict):
            out[k] = merge_params(v, source.get(k, {})) if isinstance(source, dict) else v
        else:
            sv = source.get(k) if isinstance(source, dict) else None
            out[k] = sv if sv is not None else v
    return out


def build_loader(args, subset: str, num_replicas: int = 1,
                 shuffle_seed: int = 0, run_length: int = 1):
    """``seconds_per_batch`` is the per-replica audio budget (same semantics
    as the reference CLI, where each DDP rank packs its own batches); the
    global batch is ``num_replicas``× that, sharded over the mesh."""
    dataset = AudioDataset(args.tsv_dir, subset)
    batcher = StaticShapeBatcher(
        dataset.len_list,
        max_token_count=int(args.seconds_per_batch * 16000),
        min_len=32000,
        max_len=250000,
        num_shapes=getattr(args, "num_shapes", 12),
        seed=shuffle_seed,
        num_replicas=num_replicas,
        run_length=run_length,
    )
    shard = None
    if jax.process_count() > 1:
        shard = (jax.process_index(), jax.process_count())
    return DistillDataLoader(
        dataset, batcher, num_workers=args.num_workers, seed=shuffle_seed,
        shard=shard,
        # PCM-exact int16 feed: half the host->device bytes (the feed link
        # dominates step time when the chip is behind a tunnel)
        feed_dtype="int16",
    )


def force_cpu_for_host_stage():
    """Surgery/export stages are host-side numpy+small-jax work: never claim
    an accelerator for them (on a shared remote-attached chip a claim cycle
    costs minutes).  No-op if a backend is already live (e.g. under pytest,
    whose conftest pins CPU first)."""
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
