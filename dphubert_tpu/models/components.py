"""Functional building blocks for speech SSL models with prunable gates.

TPU-first re-design of the reference component layer
(``/root/reference/wav2vec2/components.py``): every module is a pure function
``f(params_subtree, spec, x, ...)`` over the torch-layout parameter pytree
(see ``dphubert_tpu.params``), with explicit PRNG streams for dropout /
HardConcrete sampling and a static :class:`~dphubert_tpu.configs.ModelSpec`.

Numerics notes:
  * LayerNorm / GroupNorm statistics and softmax run in float32 regardless of
    the activation dtype (bf16 on TPU), matching torch-AMP behavior.
  * GELU is the exact (erf) variant, matching ``torch.nn.functional.gelu``.
  * Attention keeps the pre-softmax max-subtraction of the reference
    (``components.py:417``) — free under XLA fusion, and keeps bf16 parity.

Gates: HardConcrete masks are sampled *outside* the layer functions (see
``gates.py``) and passed in as a nested dict parallel to the layer tree, so a
single jitted train step can sample all gates from one key and the eval path
can inject deterministic compiled masks.
"""

from __future__ import annotations

import math
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import (
    AttentionSpec,
    ConvLayerSpec,
    EncoderLayerSpec,
    FeedForwardSpec,
    ModelSpec,
)

LN_EPS = 1e-5


class RngStream:
    """Deterministic stream of subkeys split from one root key.

    The mask *generator* behind each draw is the key's PRNG impl
    (``jax_default_prng_impl``): threefry2x32 by default, or the TPU
    hardware generator under ``--rng_impl rbg`` — measured 6% faster
    end-to-end (183.0 vs 194.9 ms/step device time, r4 profile) because
    the threefry subcomputations are a real slice of the bandwidth-bound
    loop-fusion budget.  The impl is recorded in training checkpoints and
    a resume under a different impl fails loudly (trainer.py).  A third
    candidate — an out-of-kernel murmur3 counter-hash like the attention
    kernels use internally — was measured in r4 and DELETED: its mask
    fusions push the packed-attention backward 1.74 MB over the 16 MB
    Mosaic scoped-VMEM limit, so the step no longer compiles on v5e
    (docs/profile_r4_hash.log).
    """

    def __init__(self, key: Optional[jax.Array]):
        self._key = key

    def next(self) -> jax.Array:
        if self._key is None:
            raise ValueError("RNG key required (training-mode dropout/sampling)")
        self._key, sub = jax.random.split(self._key)
        return sub


def _dropout(x, rate: float, training: bool, rngs: Optional[RngStream]):
    if not training or rate <= 0.0 or rngs is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rngs.next(), keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def _layer_norm(x, weight, bias, axis: int = -1, affine_axis: int = None):
    """Normalize over ``axis`` with fp32 statistics; apply the affine along
    ``affine_axis`` (defaults to the stats axis).  GroupNorm with
    num_groups==num_channels is the (stats=time, affine=channel) case.

    For sub-fp32 inputs the statistics use the one-pass E[x^2]-E[x]^2 form
    with fp32 accumulation: this avoids materializing an fp32 copy of the
    activation (a real HBM cost on the (B, 512, T) conv tensors) while the
    reductions still accumulate in fp32.  fp32 inputs keep the two-pass
    formula so CPU parity against the reference is bit-faithful.
    """
    dt = x.dtype
    if affine_axis is None:
        affine_axis = axis
    if dt == jnp.float32:
        x32 = x
        mean = jnp.mean(x32, axis=axis, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=axis, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + LN_EPS)
        if weight is not None:
            shape = [1] * x.ndim
            shape[affine_axis] = x.shape[affine_axis]
            y = y * weight.astype(jnp.float32).reshape(shape) + bias.astype(
                jnp.float32
            ).reshape(shape)
        return y
    mean = jnp.mean(x, axis=axis, keepdims=True, dtype=jnp.float32)
    mean_sq = jnp.mean(
        jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True
    )
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    scale = jax.lax.rsqrt(var + LN_EPS)
    shift = -mean * scale
    if weight is not None:
        shape = [1] * x.ndim
        shape[affine_axis] = x.shape[affine_axis]
        w32 = weight.astype(jnp.float32).reshape(shape)
        b32 = bias.astype(jnp.float32).reshape(shape)
        scale = scale * w32
        shift = shift * w32 + b32
    return (x.astype(jnp.float32) * scale + shift).astype(dt)


def _linear(p, x, dtype=None):
    """torch-layout Linear: weight (out, in)."""
    w = p["weight"]
    if dtype is not None:
        w = w.astype(dtype)
        x = x.astype(dtype)
    y = x @ w.T
    if "bias" in p:
        b = p["bias"]
        y = y + (b.astype(y.dtype) if dtype is not None else b)
    return y


def _conv1d(x, weight, bias=None, stride: int = 1, padding=0, groups: int = 1):
    """torch-layout Conv1d on (B, C, T) with weight (O, I/groups, K)."""
    if isinstance(padding, int):
        padding = [(padding, padding)]
    # NOTE: no preferred_element_type here — a f32 accumulator type with bf16
    # operands breaks the conv transpose (backward) dtype check, and the TPU
    # MXU already accumulates bf16 convs in f32 natively.
    y = jax.lax.conv_general_dilated(
        x,
        weight.astype(x.dtype),
        window_strides=(stride,),
        padding=padding,
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)[None, :, None]
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Feature extractor (reference components.py:64-235)
# ---------------------------------------------------------------------------


def conv_layer_block(
    p,
    spec: ConvLayerSpec,
    x,
    length,
    gate,
):
    """One CNN stage: Conv1d -> optional norm -> GELU -> optional channel gate.

    x: (B, C_in, T).  Returns ((B, C_out, T'), length') with the reference
    length recurrence ``floor((len - k)/stride) + 1`` clamped at 0
    (``components.py:117-119``).
    """
    w = p["conv"]["weight"].astype(x.dtype)
    y = _conv1d(x, w, p["conv"].get("bias"), stride=spec.stride)
    if spec.norm == "group_norm":
        # GroupNorm(num_groups=C, num_channels=C): per-channel stats over
        # time, per-channel affine.
        y = _layer_norm(
            y, p["layer_norm"]["weight"], p["layer_norm"]["bias"], axis=2,
            affine_axis=1,
        )
    elif spec.norm == "layer_norm":
        # The reference's transposed LayerNorm (components.py:54-61):
        # normalize over the channel axis at every frame.
        y = _layer_norm(y, p["layer_norm"]["weight"], p["layer_norm"]["bias"], axis=1)
    y = jax.nn.gelu(y, approximate=False)
    if gate is not None:
        y = y * gate.astype(y.dtype)[None, :, None]
    if length is not None:
        length = jnp.maximum(
            jnp.zeros_like(length), (length - spec.kernel_size) // spec.stride + 1
        )
    return y, length


def feature_extractor_forward(
    p,
    spec: ModelSpec,
    wave,
    lengths,
    gates=None,
):
    """(B, T) waveform -> (B, frames, C) features (reference
    ``components.py:158-185``); applies the non-trainable ``dummy_weight``
    carrier so last-layer soft masks survive into checkpoints.

    Runs on XLA's native TPU convolutions: measured at the practical
    roofline on v5e (ROADMAP.md) — a round-2 fused Pallas conv stack tied
    the forward but its recompute backward lost to XLA's native gradients
    (70 vs 42 ms fwd+bwd for the stack), so it was removed rather than
    shipped dark (git history: ops/fused_conv.py)."""
    x = wave[:, None, :]  # (B, 1, T)
    for i, cspec in enumerate(spec.conv_layers):
        gate = None
        if gates is not None:
            gate = gates.get("conv_layers", {}).get(str(i))
        x, lengths = conv_layer_block(p["conv_layers"][str(i)], cspec, x, lengths, gate)
    x = jnp.swapaxes(x, 1, 2)  # (B, frames, C)
    x = x * p["dummy_weight"].astype(x.dtype)
    return x, lengths


def output_lengths(spec: ModelSpec, lengths):
    """Compose the conv length recurrence without running the convs."""
    for c in spec.conv_layers:
        lengths = jnp.maximum(
            jnp.zeros_like(lengths), (lengths - c.kernel_size) // c.stride + 1
        )
    return lengths


# ---------------------------------------------------------------------------
# Encoder pieces
# ---------------------------------------------------------------------------


def feature_projection_forward(p, spec: ModelSpec, x, training, rngs):
    """LayerNorm -> Linear(in->embed) -> Dropout (components.py:238-277)."""
    x = _layer_norm(x, p["layer_norm"]["weight"], p["layer_norm"]["bias"])
    x = _linear(p["projection"], x, dtype=x.dtype)
    x = _dropout(x, spec.projection_dropout, training, rngs)
    return x


def pos_conv_forward(p, spec: ModelSpec, x):
    """Grouped conv positional embedding with weight_norm(dim=2) and
    even-kernel trailing trim (components.py:280-333).  x: (B, L, E)."""
    g = p["conv"]["weight_g"].astype(jnp.float32)  # (1, 1, K)
    v = p["conv"]["weight_v"].astype(jnp.float32)  # (E, E/groups, K)
    norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True))
    w = (v * (g / norm)).astype(x.dtype)
    xt = jnp.swapaxes(x, 1, 2)  # (B, E, L)
    k = spec.pos_conv_kernel
    y = _conv1d(xt, w, p["conv"]["bias"], padding=k // 2, groups=spec.pos_conv_groups)
    if k % 2 == 0:
        y = y[..., :-1]
    y = jax.nn.gelu(y, approximate=False)
    return jnp.swapaxes(y, 1, 2)


# --- WavLM relative position bias -----------------------------------------


def _relative_positions_bucket_np(
    seq_len: int, num_buckets: int, max_distance: int
) -> np.ndarray:
    """Bucketed relative positions, computed host-side (static given L).

    Bidirectional bucketing per WavLM eq. (5) (reference
    ``components.py:563-600``): half the buckets for each sign, half of those
    exact, the rest log-spaced out to ``max_distance``.
    """
    context = np.arange(seq_len, dtype=np.int64)[:, None]
    memory = np.arange(seq_len, dtype=np.int64)[None, :]
    relative = memory - context  # (L, L)

    nb = num_buckets // 2
    buckets = (relative > 0).astype(np.int64) * nb
    rel_abs = np.abs(relative)

    max_exact = nb // 2
    is_small = rel_abs < max_exact
    # log-spaced buckets for distant positions
    rel_if_large = max_exact + (
        np.log(np.maximum(rel_abs, 1).astype(np.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(np.int64)
    rel_if_large = np.minimum(rel_if_large, nb - 1)
    buckets += np.where(is_small, rel_abs, rel_if_large)
    return buckets.astype(np.int32)


def compute_wavlm_bias(p_att, spec: AttentionSpec, seq_len: int):
    """(total_num_heads, L, L) relative position bias (components.py:546-561)."""
    buckets = _relative_positions_bucket_np(
        seq_len, spec.num_buckets, spec.max_distance
    )
    table = p_att["rel_attn_embed"]["weight"]  # (num_buckets, total_heads)
    values = jnp.take(table, jnp.asarray(buckets), axis=0)  # (L, L, H)
    return jnp.transpose(values, (2, 0, 1))


# --- Attention -------------------------------------------------------------


def use_flash_attention() -> bool:
    """Flash kernel gate: on for real TPU backends, off for CPU tests
    (interpret mode is only for kernel unit tests) unless forced via
    DPHUBERT_FLASH_ATTENTION=1/0."""
    env = os.environ.get("DPHUBERT_FLASH_ATTENTION")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() == "tpu"


def _core_attention(
    p,
    spec: AttentionSpec,
    x,
    attn_mask,
    head_gate,
    layer_gate,
    training,
    rngs,
    lengths=None,
    has_bias: bool = False,
    wavlm_bias=None,
):
    """Scaled-dot-product MHA with decoupled inner width and HardConcrete
    gates (reference ``components.py:399-436``).

    x: (B, L, E); attn_mask: additive, broadcastable to (B, H, L, L) or None.
    ``lengths`` carries the same information as the pure padding mask; when
    the mask is *only* padding (no WavLM bias) the fused flash kernel applies
    it in-kernel instead of materializing (B, H, L, L).
    """
    B, L, _ = x.shape
    H, D = spec.num_heads, spec.head_dim
    scaling = D ** -0.5

    # one fused (B*L, E) @ (E, 3*H*D) matmul; weights stay separate in the
    # param tree (state-dict contract) and concatenate at trace time
    w_qkv = jnp.concatenate(
        [p["q_proj"]["weight"], p["k_proj"]["weight"], p["v_proj"]["weight"]],
        axis=0,
    ).astype(x.dtype)
    b_qkv = jnp.concatenate(
        [p["q_proj"]["bias"], p["k_proj"]["bias"], p["v_proj"]["bias"]], axis=0
    ).astype(x.dtype)
    qkv = x @ w_qkv.T + b_qkv
    q, k, v = jnp.split(qkv, 3, axis=-1)  # each (B, L, H*D)

    # Fused paths: padding-only masking; probs-dropout runs in-kernel.
    dropout_active = training and spec.dropout > 0.0 and rngs is not None
    if wavlm_bias is not None and use_flash_attention():
        # WavLM: gated rel-pos bias recomputed in-kernel from its factors
        # (bias (H, L, L) + gate (B, H, L)) — see ops/wavlm_attention.py.
        from ..ops.wavlm_attention import wavlm_flash_attention

        bias_hll, gate_bhl = wavlm_bias
        out = wavlm_flash_attention(
            q.reshape(B, L, H, D).transpose(0, 2, 1, 3),
            k.reshape(B, L, H, D).transpose(0, 2, 1, 3),
            v.reshape(B, L, H, D).transpose(0, 2, 1, 3),
            bias_hll,
            gate_bhl,
            lengths,
            scale=scaling,
            dropout_rate=spec.dropout if dropout_active else 0.0,
            dropout_rng=rngs.next() if dropout_active else None,
        ).transpose(0, 2, 1, 3)  # (B, L, H, D)
    elif not has_bias and use_flash_attention():
        from ..ops.flash_attention import flash_attention
        from ..ops.packed_attention import packed_attention, packed_num_groups

        drop_kw = dict(
            dropout_rate=spec.dropout if dropout_active else 0.0,
            dropout_rng=rngs.next() if dropout_active else None,
        )
        if packed_num_groups(L, H, D) > 0:
            # packed kernel: no head transposes, one grid cell per
            # (batch, head-group, q-tile) with a static head loop; wide
            # models (Large) and long pads run as 128-lane-aligned head
            # groups
            out = packed_attention(
                q, k, v, lengths, num_heads=H, scale=scaling, **drop_kw
            ).reshape(B, L, H, D)
        else:
            out = flash_attention(
                q.reshape(B, L, H, D).transpose(0, 2, 1, 3),
                k.reshape(B, L, H, D).transpose(0, 2, 1, 3),
                v.reshape(B, L, H, D).transpose(0, 2, 1, 3),
                lengths,
                scale=scaling,
                **drop_kw,
            ).transpose(0, 2, 1, 3)  # (B, L, H, D)
    else:
        q = q.reshape(B, L, H, D)
        k = k.reshape(B, L, H, D)
        v = v.reshape(B, L, H, D)
        # (B, H, L, L) logits on the MXU; accumulate in fp32.
        weights = jnp.einsum(
            "blhd,bmhd->bhlm", q * scaling, k, preferred_element_type=jnp.float32
        )
        if attn_mask is not None:
            weights = weights + attn_mask.astype(jnp.float32)
        weights = weights - jax.lax.stop_gradient(
            jnp.max(weights, axis=-1, keepdims=True)
        )
        probs = jax.nn.softmax(weights, axis=-1).astype(x.dtype)
        probs = _dropout(probs, spec.dropout, training, rngs)

        out = jnp.einsum(
            "bhlm,bmhd->blhd", probs, v, preferred_element_type=jnp.float32
        )
        out = out.astype(x.dtype)
    if head_gate is not None:
        out = out * head_gate.astype(out.dtype)[None, None, :, None]
    out = out.reshape(B, L, H * D)
    out = _linear(p["out_proj"], out, dtype=x.dtype)
    if layer_gate is not None:
        out = out * layer_gate.astype(out.dtype)
    return out


def self_attention_forward(
    p,
    spec: AttentionSpec,
    x,
    attn_mask,
    position_bias,
    gates,
    training,
    rngs,
    lengths=None,
):
    """Dispatch between plain SelfAttention and WavLMSelfAttention.

    Returns (output, position_bias) — position_bias is threaded through
    layers for WavLM (computed once in the first layer,
    reference ``components.py:629-631``).
    """
    head_gate = gates.get("heads") if gates else None
    layer_gate = gates.get("layer") if gates else None

    if not spec.is_wavlm:
        return (
            _core_attention(
                p, spec, x, attn_mask, head_gate, layer_gate, training, rngs,
                lengths=lengths, has_bias=False,
            ),
            position_bias,
        )

    B, L, _ = x.shape
    TH = spec.total_num_heads
    if spec.has_relative_attention_bias and position_bias is None:
        position_bias = compute_wavlm_bias(p, spec, L)  # (TH, L, L)

    gate_a_1 = None  # (B, TH, L, 1)
    if position_bias is not None and spec.gru_rel_pos:
        # GRU-style gating of the bias, computed from the *pre-projection*
        # query split into total_num_heads chunks (components.py:636-644).
        head_dim = spec.embed_dim // TH
        query_layer = x.reshape(B, L, TH, head_dim).transpose(0, 2, 1, 3)
        gates_raw = _linear(p["gru_rel_pos_linear"], query_layer, dtype=x.dtype)
        gates_sum = jax.nn.sigmoid(
            gates_raw.reshape(B, TH, L, 2, 4).sum(-1).astype(jnp.float32)
        )
        gate_a = gates_sum[..., 0:1]
        gate_b = gates_sum[..., 1:2]
        const = p["gru_rel_pos_const"].astype(jnp.float32)  # (1, TH, 1, 1)
        gate_a_1 = gate_a * (gate_b * const - 1.0) + 2.0  # (B, TH, L, 1)

    keep_heads = None
    if spec.remaining_heads is not None and len(spec.remaining_heads) != TH:
        keep_heads = jnp.asarray(spec.remaining_heads)

    # the fused kernel masks padding from ``lengths`` only; a caller passing
    # a general attn_mask without lengths must take the dense path or the
    # mask would be silently dropped
    if (position_bias is not None and use_flash_attention()
            and not (attn_mask is not None and lengths is None)):
        # fused path: the bias stays factored as (H, L, L) x (B, H, L) and
        # the gated sum is recomputed inside the kernel (wavlm_attention.py)
        bias_hll = position_bias
        if gate_a_1 is not None:
            gate_bhl = gate_a_1[..., 0]  # (B, TH, L)
        else:
            gate_bhl = jnp.ones((B, TH, L), jnp.float32)
        if keep_heads is not None:
            bias_hll = bias_hll[keep_heads]
            gate_bhl = gate_bhl[:, keep_heads]
        out = _core_attention(
            p, spec, x, None, head_gate, layer_gate, training, rngs,
            lengths=lengths, wavlm_bias=(bias_hll, gate_bhl),
        )
        return out, position_bias

    mask = attn_mask
    if position_bias is not None:
        biased = jnp.broadcast_to(position_bias[None], (B, TH, L, L))
        if gate_a_1 is not None:
            biased = gate_a_1 * biased.astype(jnp.float32)
        # select the surviving heads' bias rows (components.py:647)
        if keep_heads is not None:
            biased = biased[:, keep_heads, :, :]
        mask = biased if attn_mask is None else biased + attn_mask
    out = _core_attention(
        p, spec, x, mask, head_gate, layer_gate, training, rngs,
        lengths=lengths, has_bias=mask is not None,
    )
    return out, position_bias


# --- Feed forward ----------------------------------------------------------


def feed_forward_forward(
    p, spec: FeedForwardSpec, x, gates, training, rngs
):
    """Linear -> GELU -> Dropout -> [interm gate] -> Linear -> Dropout ->
    [layer gate] (reference ``components.py:726-748``)."""
    interm_gate = gates.get("intermediate") if gates else None
    layer_gate = gates.get("layer") if gates else None

    y = _linear(p["intermediate_dense"], x, dtype=x.dtype)
    y = jax.nn.gelu(y, approximate=False)
    y = _dropout(y, spec.intermediate_dropout, training, rngs)
    if interm_gate is not None:
        y = y * interm_gate.astype(y.dtype)
    y = _linear(p["output_dense"], y, dtype=x.dtype)
    y = _dropout(y, spec.output_dropout, training, rngs)
    if layer_gate is not None:
        y = y * layer_gate.astype(y.dtype)
    return y


# --- Encoder layer ---------------------------------------------------------


def encoder_layer_forward(
    p,
    spec: EncoderLayerSpec,
    x,
    attn_mask,
    position_bias,
    gates,
    training,
    rngs,
    lengths=None,
):
    """Pre/post-norm residual block.  Either sublayer may be pruned away; in
    the post-norm path both LayerNorms still apply (components.py:848-856)."""
    att_gates = gates.get("attention") if gates else None
    ff_gates = gates.get("feed_forward") if gates else None

    if spec.attention is not None:
        residual = x
        if spec.layer_norm_first:
            x = _layer_norm(x, p["layer_norm"]["weight"], p["layer_norm"]["bias"])
        x, position_bias = self_attention_forward(
            p["attention"],
            spec.attention,
            x,
            attn_mask,
            position_bias,
            att_gates,
            training,
            rngs,
            lengths=lengths,
        )
        x = _dropout(x, spec.dropout, training, rngs)
        x = residual + x

    if spec.layer_norm_first:
        if spec.feed_forward is not None:
            h = _layer_norm(
                x, p["final_layer_norm"]["weight"], p["final_layer_norm"]["bias"]
            )
            x = x + feed_forward_forward(
                p["feed_forward"], spec.feed_forward, h, ff_gates, training, rngs
            )
    else:
        x = _layer_norm(x, p["layer_norm"]["weight"], p["layer_norm"]["bias"])
        if spec.feed_forward is not None:
            x = x + feed_forward_forward(
                p["feed_forward"], spec.feed_forward, x, ff_gates, training, rngs
            )
        x = _layer_norm(
            x, p["final_layer_norm"]["weight"], p["final_layer_norm"]["bias"]
        )
    return x, position_bias


# --- Transformer -----------------------------------------------------------


def _transformer_preprocess(p, spec: ModelSpec, x, training, rngs):
    x = x + pos_conv_forward(p["pos_conv_embed"], spec, x)
    if spec.transformer_layer_norm_first:
        x = _layer_norm(x, p["layer_norm"]["weight"], p["layer_norm"]["bias"])
    x = _dropout(x, spec.dropout, training, rngs)
    return x


def transformer_forward(
    p,
    spec: ModelSpec,
    x,
    attn_mask,
    gates,
    training,
    rngs,
    lengths=None,
    remat: bool = False,
):
    """Full pass through all layers with LayerDrop (components.py:894-907)."""
    x = _transformer_preprocess(p, spec, x, training, rngs)
    position_bias = None
    # Per-layer keys are pre-split OUTSIDE any jax.checkpoint body: advancing
    # a shared stream inside a remat trace leaks tracers across layers.
    layer_keys = [
        (rngs.next() if (training and rngs is not None) else None)
        for _ in spec.layers
    ]
    for i, layer in enumerate(spec.layers):
        lp = p["layers"][str(i)]
        lg = gates.get("layers", {}).get(str(i)) if gates else None

        def run(x, position_bias=position_bias, lp=lp, layer=layer, lg=lg, i=i):
            def body(lp_, x_, pb_, lg_, mask_, lens_, key_):
                layer_rngs = RngStream(key_) if key_ is not None else None
                return encoder_layer_forward(
                    lp_, layer, x_, mask_, pb_, lg_, training, layer_rngs,
                    lengths=lens_,
                )

            fn = jax.checkpoint(body) if remat else body
            return fn(lp, x, position_bias, lg, attn_mask, lengths, layer_keys[i])

        if training and spec.layer_drop > 0.0 and rngs is not None:
            u = jax.random.uniform(rngs.next(), ())
            # Keys for the layer body must be pre-split so both branches of
            # the cond see the same stream state.
            new_x, new_bias = run(x)
            keep = u > spec.layer_drop
            x = jnp.where(keep, new_x, x)
            if new_bias is not None and position_bias is None:
                position_bias = new_bias  # bias is layer-independent; keep it
            elif new_bias is not None:
                position_bias = new_bias
        else:
            x, position_bias = run(x)

    if not spec.transformer_layer_norm_first:
        x = _layer_norm(x, p["layer_norm"]["weight"], p["layer_norm"]["bias"])
    return x


def _uniform_scannable(spec: ModelSpec) -> bool:
    """True when every encoder layer is identical and WavLM-free — the
    stacked-params lax.scan fast path applies (uniform teacher / ungated or
    uniformly-gated student).  Heterogeneous pruned students stay unrolled."""
    if spec.is_wavlm or not spec.layers:
        return False
    first = spec.layers[0]
    return all(l == first for l in spec.layers) and first.attention is not None


def transformer_intermediate_outputs_scan(
    p,
    spec: ModelSpec,
    x,
    attn_mask,
    gates,
    training,
    rngs,
    lengths=None,
    remat: bool = False,
) -> List[jax.Array]:
    """lax.scan over stacked per-layer params — one compiled layer body
    instead of N unrolled copies (cuts trace/compile time and per-op launch
    overhead for uniform models).  Numerically identical to the unrolled
    path given the same per-layer key schedule."""
    x = _transformer_preprocess(p, spec, x, training, rngs)
    n = spec.num_layers
    layer = spec.layers[0]

    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[p["layers"][str(i)] for i in range(n)]
    )
    layer_gates = None
    if gates and gates.get("layers"):
        layer_gates = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[gates["layers"][str(i)] for i in range(n)]
        )
    if training and rngs is not None:
        keys = jnp.stack([rngs.next() for _ in range(n)])
    else:
        keys = None

    def body(x, per_layer):
        lp, lg, key = per_layer
        layer_rngs = RngStream(key) if key is not None else None
        y, _ = encoder_layer_forward(
            lp, layer, x, attn_mask, None, lg, training, layer_rngs,
            lengths=lengths,
        )
        return y, y

    if remat:
        body = jax.checkpoint(body)
    _, ys = jax.lax.scan(body, x, (stacked, layer_gates, keys))
    return [ys[i] for i in range(n)]


def transformer_intermediate_outputs(
    p,
    spec: ModelSpec,
    x,
    attn_mask,
    gates,
    training,
    rngs,
    num_layers: Optional[int] = None,
    lengths=None,
    remat: bool = False,
) -> List[jax.Array]:
    """Every layer's hidden state, never applying LayerDrop — distillation
    sees all layers (reference ``components.py:909-927``)."""
    x = _transformer_preprocess(p, spec, x, training, rngs)
    outs: List[jax.Array] = []
    position_bias = None
    # pre-split per-layer keys (see transformer_forward for why)
    layer_keys = [
        (rngs.next() if (training and rngs is not None) else None)
        for _ in spec.layers
    ]
    for i, layer in enumerate(spec.layers):
        lg = gates.get("layers", {}).get(str(i)) if gates else None

        def body(lp_, x_, pb_, lg_, mask_, lens_, key_, layer=layer):
            layer_rngs = RngStream(key_) if key_ is not None else None
            return encoder_layer_forward(
                lp_, layer, x_, mask_, pb_, lg_, training, layer_rngs,
                lengths=lens_,
            )

        # trade recompute for activation memory (per-layer checkpoint) — the
        # TPU counterpart of torch activation checkpointing; enables the
        # reference's 160 s/chip batch without grad accumulation
        fn = jax.checkpoint(body) if remat else body
        x, position_bias = fn(
            p["layers"][str(i)], x, position_bias, lg, attn_mask, lengths,
            layer_keys[i],
        )
        outs.append(x)
        if num_layers is not None and len(outs) >= num_layers:
            return outs
    return outs


# --- Encoder ---------------------------------------------------------------


def encoder_preprocess(p, spec: ModelSpec, features, lengths, training, rngs):
    """Projection + additive -10000 attention mask from lengths; padded
    positions zeroed (reference ``components.py:968-984``)."""
    x = feature_projection_forward(
        p["feature_projection"], spec, features, training, rngs
    )
    mask = None
    if lengths is not None:
        B, L, _ = x.shape
        pad = jnp.arange(L)[None, :] >= lengths[:, None]  # (B, L) True at pads
        x = jnp.where(pad[:, :, None], jnp.zeros_like(x), x)
        mask = (-10000.0 * pad.astype(jnp.float32))[:, None, None, :]
        mask = jnp.broadcast_to(mask, (B, 1, L, L))
    return x, mask


def encoder_forward(p, spec: ModelSpec, features, lengths, gates, training, rngs):
    x, mask = encoder_preprocess(p, spec, features, lengths, training, rngs)
    return transformer_forward(
        p["transformer"], spec, x, mask, gates, training, rngs, lengths=lengths
    )


def encoder_extract_features(
    p,
    spec: ModelSpec,
    features,
    lengths,
    gates,
    training,
    rngs,
    num_layers: Optional[int] = None,
    remat: bool = False,
    scan_layers: bool = False,
) -> List[jax.Array]:
    """Returns ``[projected_input] + per-layer outputs`` — index 0 is the
    pre-transformer hidden state (reference ``components.py:995-1003``)."""
    x, mask = encoder_preprocess(p, spec, features, lengths, training, rngs)
    if scan_layers and num_layers is None and _uniform_scannable(spec):
        interm = transformer_intermediate_outputs_scan(
            p["transformer"], spec, x, mask, gates, training, rngs,
            lengths=lengths, remat=remat,
        )
    else:
        interm = transformer_intermediate_outputs(
            p["transformer"], spec, x, mask, gates, training, rngs, num_layers,
            lengths=lengths, remat=remat,
        )
    return [x] + interm


# ---------------------------------------------------------------------------
# Waveform normalization (reference model.py:96-103)
# ---------------------------------------------------------------------------


def normalize_waveform(wave, lengths):
    """Per-utterance LayerNorm over the valid samples only (Large family)."""
    if lengths is None:
        return _layer_norm(wave, None, None, axis=-1)
    T = wave.shape[1]
    valid = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)
    w32 = wave.astype(jnp.float32) * valid
    n = jnp.maximum(lengths.astype(jnp.float32), 1.0)[:, None]
    mean = jnp.sum(w32, axis=1, keepdims=True) / n
    centered = (w32 - mean) * valid
    var = jnp.sum(jnp.square(centered), axis=1, keepdims=True) / n
    normed = centered * jax.lax.rsqrt(var + LN_EPS)
    return (normed * valid).astype(wave.dtype)
