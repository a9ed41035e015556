"""Parameter pytrees and state-dict interop.

Design rule: the parameter pytree is a nested dict whose structure and leaf
layouts mirror the reference's torch module tree *exactly*.  Flattening with
``"."``-joined keys reproduces the reference state-dict key set byte-for-byte
(e.g. ``feature_extractor.conv_layers.0.conv.weight``), and leaves keep torch
layouts (Linear ``(out, in)``, Conv1d ``(out, in, k)``).  This makes the
``{"config", "state_dict"}`` portable-checkpoint contract
(reference ``prune.py:62-74``, ``README.md:92-101``) a pure flatten/unflatten
with no renaming or transposition.

Forward code transposes at use sites; XLA folds those transposes into the
matmuls at compile time, so there is no runtime cost on TPU.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .configs import (
    AttentionSpec,
    ConvLayerSpec,
    FeedForwardSpec,
    ModelSpec,
)

Params = Dict[str, object]


def flatten_params(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    """Nested dict -> flat ``{"a.b.c": leaf}`` (torch state-dict layout)."""
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(flatten_params(v, prefix=f"{key}."))
        else:
            out[key] = v
    return out


def unflatten_params(flat: Dict[str, np.ndarray]) -> Params:
    """Flat torch-style state dict -> nested pytree."""
    tree: Params = {}
    for key, v in flat.items():
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def tree_to_jax(tree, dtype=None):
    def conv(x):
        arr = jnp.asarray(np.asarray(x))
        if dtype is not None and jnp.issubdtype(arr.dtype, jnp.floating):
            arr = arr.astype(dtype)
        return arr

    return jax.tree.map(conv, tree)


def tree_to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def num_leaves_numel(tree) -> int:
    """Total element count across all leaves — equals the reference's
    ``sum(p.numel() for p in model.parameters())`` (``lightning.py:170``),
    since the param tree holds exactly the torch parameters (including the
    non-trainable ``dummy_weight`` and HardConcrete ``log_alpha``)."""
    return int(sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(tree)))


# ---------------------------------------------------------------------------
# Initialization
#
# Mirrors the torch default initializers used by the reference modules so a
# randomly-initialized model has the same weight statistics:
#   * nn.Linear / nn.Conv1d: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), ..)
#     for weight; U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for bias.
#   * nn.LayerNorm / nn.GroupNorm: weight=1, bias=0.
#   * HardConcrete.log_alpha ~ N(log(1-m)-log(m), 0.01)  (hardconcrete.py:70-74)
# ---------------------------------------------------------------------------


class _KeyGen:
    def __init__(self, key):
        self._key = key

    def __call__(self):
        self._key, sub = jax.random.split(self._key)
        return sub


def _linear_init(kg, out_features: int, in_features: int, bias: bool = True):
    bound_w = 1.0 / math.sqrt(in_features)
    p = {
        "weight": jax.random.uniform(
            kg(), (out_features, in_features), jnp.float32, -bound_w, bound_w
        )
    }
    if bias:
        p["bias"] = jax.random.uniform(
            kg(), (out_features,), jnp.float32, -bound_w, bound_w
        )
    return p


def _conv1d_init(kg, out_ch: int, in_ch: int, k: int, bias: bool):
    fan_in = in_ch * k
    bound = 1.0 / math.sqrt(fan_in)
    p = {
        "weight": jax.random.uniform(
            kg(), (out_ch, in_ch, k), jnp.float32, -bound, bound
        )
    }
    if bias:
        p["bias"] = jax.random.uniform(kg(), (out_ch,), jnp.float32, -bound, bound)
    return p


def _norm_init(n: int):
    return {"weight": jnp.ones((n,), jnp.float32), "bias": jnp.zeros((n,), jnp.float32)}


def hard_concrete_init(kg, n_in: int, init_mean: float, init_std: float = 0.01):
    mean = math.log(1 - init_mean) - math.log(init_mean)
    return {
        "log_alpha": mean + init_std * jax.random.normal(kg(), (n_in,), jnp.float32)
    }


def _attention_init(kg, spec: AttentionSpec):
    inner = spec.num_heads * spec.head_dim
    p = {
        "k_proj": _linear_init(kg, inner, spec.embed_dim),
        "v_proj": _linear_init(kg, inner, spec.embed_dim),
        "q_proj": _linear_init(kg, inner, spec.embed_dim),
        "out_proj": _linear_init(kg, spec.embed_dim, inner),
    }
    if spec.is_wavlm:
        if spec.has_relative_attention_bias:
            # nn.Embedding default init: N(0, 1)
            p["rel_attn_embed"] = {
                "weight": jax.random.normal(
                    kg(), (spec.num_buckets, spec.total_num_heads), jnp.float32
                )
            }
        if spec.gru_rel_pos:
            p["gru_rel_pos_linear"] = _linear_init(kg, 8, spec.head_dim)
            p["gru_rel_pos_const"] = jnp.ones(
                (1, spec.total_num_heads, 1, 1), jnp.float32
            )
    # HardConcrete gate init means from reference components.py:370,375
    if spec.prune_heads:
        p["hard_concrete_for_heads"] = hard_concrete_init(kg, spec.num_heads, 0.01)
    if spec.prune_layer:
        p["hard_concrete_for_layer"] = hard_concrete_init(kg, 1, 0.01)
    return p


def _feed_forward_init(kg, spec: FeedForwardSpec):
    p = {
        "intermediate_dense": _linear_init(
            kg, spec.intermediate_features, spec.io_features
        ),
        "output_dense": _linear_init(kg, spec.io_features, spec.intermediate_features),
    }
    # init means from reference components.py:715-717,722
    if spec.prune_intermediate:
        p["hard_concrete_for_intermediate"] = hard_concrete_init(
            kg, spec.intermediate_features, 0.5
        )
    if spec.prune_layer:
        p["hard_concrete_for_layer"] = hard_concrete_init(kg, 1, 0.01)
    return p


def _conv_block_init(kg, spec: ConvLayerSpec):
    p = {
        "conv": _conv1d_init(
            kg, spec.out_channels, spec.in_channels, spec.kernel_size, spec.bias
        )
    }
    if spec.norm is not None:
        p["layer_norm"] = _norm_init(spec.out_channels)
    if spec.prune_channels:
        # init_mean=0.01 (reference components.py:90)
        p["hard_concrete"] = hard_concrete_init(kg, spec.out_channels, 0.01)
    return p


def init_params(spec: ModelSpec, key) -> Params:
    """Random-initialize the full parameter pytree for ``spec``."""
    kg = _KeyGen(key)

    fe = {
        "conv_layers": {
            str(i): _conv_block_init(kg, c) for i, c in enumerate(spec.conv_layers)
        },
        # non-trainable carrier for the last conv layer's soft mask
        # (reference components.py:152-156)
        "dummy_weight": jnp.ones((spec.conv_layers[-1].out_channels,), jnp.float32),
    }

    # pos-conv with weight_norm on dim=2 (reference components.py:298-307):
    # state dict stores (weight_g, weight_v); g has shape (1, 1, K).
    e, k, g = spec.embed_dim, spec.pos_conv_kernel, spec.pos_conv_groups
    raw = _conv1d_init(kg, e, e // g, k, bias=True)
    v = raw["weight"]
    g_norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True))
    pos_conv = {
        "conv": {"bias": raw["bias"], "weight_g": g_norm, "weight_v": v},
    }

    layers = {}
    for i, layer in enumerate(spec.layers):
        lp = {
            "layer_norm": _norm_init(layer.embed_dim),
            "final_layer_norm": _norm_init(layer.embed_dim),
        }
        if layer.attention is not None:
            lp["attention"] = _attention_init(kg, layer.attention)
        if layer.feed_forward is not None:
            lp["feed_forward"] = _feed_forward_init(kg, layer.feed_forward)
        layers[str(i)] = lp

    encoder = {
        "feature_projection": {
            "layer_norm": _norm_init(spec.encoder_in_features),
            "projection": _linear_init(kg, spec.embed_dim, spec.encoder_in_features),
        },
        "transformer": {
            "pos_conv_embed": pos_conv,
            "layer_norm": _norm_init(spec.embed_dim),
            "layers": layers,
        },
    }

    params = {"feature_extractor": fe, "encoder": encoder}
    if spec.aux_num_out is not None:
        params["aux"] = _linear_init(kg, spec.aux_num_out, spec.embed_dim)
    return params
