"""Distillation loss (reference ``lightning.py:91-139``).

Per-element weighted sum over stacked (batch, layer, time, feature) student
vs teacher tensors: MSE + L1 + cosine (over the feature axis; ``raw`` is
``-mean(cos)``, ``log_sig`` is ``-mean(log sigmoid(cos))``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def cosine_similarity(a, b, axis=-1, eps=1e-8):
    """torch.nn.CosineSimilarity semantics: norms clamped at eps."""
    a32 = a.astype(jnp.float32)
    b32 = b.astype(jnp.float32)
    na = jnp.maximum(jnp.linalg.norm(a32, axis=axis), eps)
    nb = jnp.maximum(jnp.linalg.norm(b32, axis=axis), eps)
    return jnp.sum(a32 * b32, axis=axis) / (na * nb)


def distill_loss(
    student,
    teacher,
    *,
    l2_weight: float,
    l1_weight: float,
    cos_weight: float,
    cos_type: str = "raw",
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array, jax.Array]]:
    """Returns (total, (mse, l1, cos)) like the reference module."""
    if cos_type not in ("raw", "log_sig"):
        raise ValueError(cos_type)
    s32 = student.astype(jnp.float32)
    t32 = teacher.astype(jnp.float32)
    zero = jnp.zeros((), jnp.float32)
    loss_mse = jnp.mean(jnp.square(s32 - t32)) if l2_weight != 0 else zero
    loss_l1 = jnp.mean(jnp.abs(s32 - t32)) if l1_weight != 0 else zero
    if cos_weight != 0:
        cos = cosine_similarity(s32, t32, axis=-1)
        if cos_type == "raw":
            loss_cos = -jnp.mean(cos)
        else:
            loss_cos = -jnp.mean(jnp.log(jax.nn.sigmoid(cos)))
    else:
        loss_cos = zero
    total = l2_weight * loss_mse + l1_weight * loss_l1 + cos_weight * loss_cos
    return total, (loss_mse, loss_l1, loss_cos)


def distill_loss_unstacked(
    proj_params: dict,
    mode: str,
    groups,
    student_hiddens,
    teacher_hiddens,
    distill_layers,
    *,
    l2_weight: float,
    l1_weight: float,
    cos_weight: float,
    cos_type: str = "raw",
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array, jax.Array]]:
    """Projection + distill loss without materializing the stacked
    (batch, n_layers, time, feature) tensors.

    Mathematically identical to ``apply_projections`` + ``distill_loss``
    (reference lightning.py:116-139,254-263): every selected layer has the
    same shape, so the mean over the stacked tensor equals the mean of
    per-layer means.  Computing per layer lets XLA fuse each projection
    matmul with its fp32 loss reductions instead of writing two
    ~(B, n_layers, T, 768) stacks (plus their fp32 upcasts and backward
    reads) through HBM — the distill-loss share of the bandwidth-bound
    "loop fusion" step time drops accordingly.
    """
    if cos_type not in ("raw", "log_sig"):
        raise ValueError(cos_type)

    # (projection params, student layer index) per stacked slot, mirroring
    # apply_projections' slot order
    pairs = []
    if mode == "layer2layer":
        for gi, g in enumerate(groups):
            for layer_idx in g:
                pairs.append((proj_params["groups"][str(gi)], layer_idx))
    elif mode == "predlayer":
        flat = [l for g in groups for l in g]
        for li in range(len(flat)):
            pairs.append((proj_params["groups"][str(li)], None))
    else:
        raise ValueError(f"Invalid distill mode: {mode}")

    zero = jnp.zeros((), jnp.float32)
    acc_mse, acc_l1, acc_cos = zero, zero, zero
    for slot, (p, layer_idx) in enumerate(pairs):
        if mode == "layer2layer":
            h = student_hiddens[layer_idx]
            s = h @ p["weight"].astype(h.dtype).T + p["bias"].astype(h.dtype)
        else:
            last = student_hiddens[-1]
            s = last @ p["weight"].astype(last.dtype).T + p["bias"].astype(last.dtype)
            s = jax.nn.gelu(s, approximate=False)
        t = jax.lax.stop_gradient(teacher_hiddens[distill_layers[slot]])
        s32 = s.astype(jnp.float32)
        t32 = t.astype(jnp.float32)
        if l2_weight != 0:
            acc_mse = acc_mse + jnp.mean(jnp.square(s32 - t32))
        if l1_weight != 0:
            acc_l1 = acc_l1 + jnp.mean(jnp.abs(s32 - t32))
        if cos_weight != 0:
            cos = cosine_similarity(s32, t32, axis=-1)
            if cos_type == "raw":
                acc_cos = acc_cos - jnp.mean(cos)
            else:
                acc_cos = acc_cos - jnp.mean(jnp.log(jax.nn.sigmoid(cos)))
    n = float(len(pairs))
    loss_mse, loss_l1, loss_cos = acc_mse / n, acc_l1 / n, acc_cos / n
    total = l2_weight * loss_mse + l1_weight * loss_l1 + cos_weight * loss_cos
    return total, (loss_mse, loss_l1, loss_cos)
